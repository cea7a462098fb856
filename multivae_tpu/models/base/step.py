"""Traced per-step scalars passed into model loss functions.

The reference passes ``epoch`` / ``batch_ratio`` / ``dataset_size`` python
kwargs into ``model.forward`` (``trainers/base/base_trainer.py:667-673``),
which under jit would retrace every epoch. Here they are traced scalars in a
small pytree, so annealing schedules (MVAE/JMVAE/Nexus warmups) compile once.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class StepInfo:
    epoch: jnp.ndarray
    batch_ratio: jnp.ndarray
    dataset_size: jnp.ndarray

    @classmethod
    def create(cls, epoch=1.0, batch_ratio=0.0, dataset_size=1.0) -> "StepInfo":
        return cls(
            epoch=jnp.asarray(epoch, jnp.float32),
            batch_ratio=jnp.asarray(batch_ratio, jnp.float32),
            dataset_size=jnp.asarray(dataset_size, jnp.float32),
        )
