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
    """

    metric: Literal["SSIM", "MSE"] = "SSIM"
