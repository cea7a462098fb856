"""Evaluator base config (reference
``src/multivae/metrics/base/evaluator_config.py``)."""

from __future__ import annotations

from typing import Optional

from pydantic.dataclasses import dataclass

from ...utils.config import BaseConfig


@dataclass
class EvaluatorConfig(BaseConfig):
    """Base config for evaluation modules.

    Args:
        batch_size: evaluation batch size.
        wandb_path: 'entity/project/run_id' to resume logging into an
            existing wandb run (requires the optional wandb package).
        n_devices: shard evaluation batches over a 1-D data mesh of this
            many devices (TPU-native extension; the reference evaluates on
            one device). The model's jitted eval programs are partitioned
            by XLA from the input shardings; batch_size is rounded up to a
            multiple of n_devices (padding rows carry zero weight).
    """

    batch_size: int = 512
    wandb_path: Optional[str] = None
    n_devices: int = 1
