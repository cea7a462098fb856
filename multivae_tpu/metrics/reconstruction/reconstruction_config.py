"""Reconstruction evaluator config (reference
``src/multivae/metrics/reconstruction/reconstruction_config.py``)."""

from __future__ import annotations

from typing import Literal

from pydantic.dataclasses import dataclass

from ..base.evaluator_config import EvaluatorConfig


@dataclass
class ReconstructionConfig(EvaluatorConfig):
    """Config for reconstruction metrics.

    Args:
        metric: 'SSIM' (images only) or 'MSE'.
        fused_sweep: evaluate all subsets (joint + unimodal) in ONE
            compiled device call per test batch, with per-sample SSIM/MSE
            computed in-graph (see ``metrics/base/subset_sweep.py``).
            Falls back to the per-subset loop on models without the
            traced-subset encode. TPU-native extension, on by default.
    """

    metric: Literal["SSIM", "MSE"] = "SSIM"
    fused_sweep: bool = True
