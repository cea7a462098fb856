"""FID evaluator config (reference
``src/multivae/metrics/fids/fids_config.py``)."""

from __future__ import annotations

from typing import Optional

from pydantic.dataclasses import dataclass

from ..base.evaluator_config import EvaluatorConfig


@dataclass
class FIDEvaluatorConfig(EvaluatorConfig):
    """Config for the Fréchet-distance evaluation.

    Args:
        inception_weights_path: path to converted InceptionV3 weights
            (msgpack). Required only when no custom encoders are provided.
        dims_inception: embedding dimension of the inception layer.
        fused_sweep: run the conditional-FID subset sweep as one compiled
            device call per test batch (transform + embedder in-graph;
            see ``metrics/base/subset_sweep.py``). Falls back to the
            per-subset loop when the model or embedder can't be traced.
            TPU-native extension, on by default.
        subset_chunk: max number of conditioning subsets embedded
            CONCURRENTLY inside the fused sweep (the sweep stays one
            program; the subset axis is scanned in chunks of this size).
            None = sized automatically from ``subset_activation_budget_gb``
            and the embedder's input shape — with the 299x299 Inception
            embedder this lands at 1-2 concurrent subsets (all 15 at once
            would OOM a 16 GB chip); tiny custom embedders get the full
            vmap.
        subset_activation_budget_gb: activation-memory budget used by the
            automatic ``subset_chunk`` sizing.
    """

    inception_weights_path: Optional[str] = "../fid_model/model.msgpack"
    dims_inception: int = 2048
    fused_sweep: bool = True
    subset_chunk: Optional[int] = None
    subset_activation_budget_gb: float = 4.0
