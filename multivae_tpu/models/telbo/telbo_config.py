"""TELBO config (reference ``src/multivae/models/telbo/telbo_config.py``)."""

from __future__ import annotations

from typing import Union

from pydantic.dataclasses import dataclass

from ..joint_models.joint_model_config import BaseJointModelConfig


@dataclass
class TELBOConfig(BaseJointModelConfig):
    """Config for TELBO ('Generative models of visually grounded
    imagination').

    Args:
        warmup: epochs of joint-ELBO training (stage 1); after warmup, the
            joint encoder and decoders are frozen and the unimodal ELBOs are
            trained (stage 2). Requires the MultistageTrainer.
        lambda_factors: per-modality recon weights for stage 1 (defaults to
            the likelihood rescale factors).
        gamma_factors: per-modality recon weights for stage 2.
    """

    warmup: int = 10
    lambda_factors: Union[dict, None] = None
    gamma_factors: Union[dict, None] = None
