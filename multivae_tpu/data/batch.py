"""The batch pytree consumed by every model's compute path.

The reference passes a ``MultimodalBaseDataset``/``DatasetOutput`` object
(attr-dict of torch tensors) into ``model.forward``
(``src/multivae/data/datasets/base.py:55-71``). The TPU-native equivalent is
a frozen flax struct so that batches flow through ``jax.jit`` with a *static
structure*:

- ``masks`` is always present (all-ones for complete datasets) so complete
  and incomplete data compile to the same program; models simply multiply.
- ``weights`` carries per-sample validity, used to give zero weight to the
  padding samples the loader adds to keep batch shapes static (the reference
  instead lets the last batch be smaller, which would retrace under jit).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class MultimodalBatch:
    """A batch of multimodal data as a pytree of arrays.

    Attributes:
        data: modality name -> array of shape (B, *modality_dims). For token
            modalities the value may itself be a dict (e.g. {'tokens': ...,
            'one_hot': ...}) mirroring the reference CUB text convention.
        masks: modality name -> float (B,) availability mask (1=available).
        labels: optional (B,) labels.
        weights: float (B,) sample weights; 0 marks padding samples.
    """

    data: Dict[str, jnp.ndarray]
    masks: Dict[str, jnp.ndarray]
    weights: jnp.ndarray
    labels: Optional[jnp.ndarray] = None
    # static flag: did the source dataset declare masks (IncompleteDataset)?
    # Models branch on this at trace time exactly where the reference checks
    # ``hasattr(inputs, "masks")``.
    incomplete: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def n_samples(self) -> int:
        first = next(iter(self.data.values()))
        if isinstance(first, dict):
            first = next(iter(first.values()))
        return first.shape[0]

    def modality(self, name: str):
        return self.data[name]

    def mask(self, name: str):
        return self.masks[name]

    def subset_batch(self, modalities) -> "MultimodalBatch":
        """A view restricted to the given modalities (static selection)."""
        mods = list(modalities)
        return MultimodalBatch(
            data={m: self.data[m] for m in mods},
            masks={m: self.masks[m] for m in mods},
            weights=self.weights,
            labels=self.labels,
            incomplete=self.incomplete,
        )


def as_batch(inputs) -> MultimodalBatch:
    """Coerce user inputs to a MultimodalBatch.

    Accepts a MultimodalBatch (pass-through), a dataset / DatasetOutput /
    dict exposing ``data`` (and optional ``masks`` / ``labels``), or a bare
    dict of modality arrays.
    """
    if isinstance(inputs, MultimodalBatch):
        return inputs
    if isinstance(inputs, dict) and "data" not in inputs:
        return batch_from_arrays(data=inputs)
    data = inputs["data"] if isinstance(inputs, dict) else inputs.data
    masks = None
    labels = None
    if isinstance(inputs, dict):
        masks = inputs.get("masks", None)
        labels = inputs.get("labels", None)
    else:
        masks = getattr(inputs, "masks", None)
        labels = getattr(inputs, "labels", None)
    return batch_from_arrays(data=data, masks=masks, labels=labels)


def _leading_dim(value) -> int:
    if isinstance(value, dict):
        value = next(iter(value.values()))
    return value.shape[0]


def batch_from_arrays(data: dict, masks: Optional[dict] = None, labels=None,
                      weights=None, dtype=jnp.float32,
                      incomplete: Optional[bool] = None) -> MultimodalBatch:
    """Build a MultimodalBatch from numpy/jnp arrays, filling defaults."""
    if incomplete is None:
        incomplete = masks is not None
    data = {
        k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict) else jnp.asarray(v))
        for k, v in data.items()
    }
    n = _leading_dim(next(iter(data.values())))
    if masks is None:
        masks = {k: jnp.ones((n,), dtype=dtype) for k in data}
    else:
        masks = {k: jnp.asarray(masks[k]).astype(dtype).reshape(n) for k in data}
    if weights is None:
        weights = jnp.ones((n,), dtype=dtype)
    else:
        weights = jnp.asarray(weights).astype(dtype)
    if labels is not None:
        labels = jnp.asarray(labels)
    return MultimodalBatch(data=data, masks=masks, weights=weights,
                           labels=labels, incomplete=bool(incomplete))
