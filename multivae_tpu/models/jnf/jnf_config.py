"""JNF config (reference ``src/multivae/models/jnf/jnf_config.py``)."""

from __future__ import annotations

from pydantic.dataclasses import dataclass

from ..joint_models.joint_model_config import BaseJointModelConfig


@dataclass
class JNFConfig(BaseJointModelConfig):
    """Config for JNF ('Improving Multimodal Joint Variational Autoencoders
    through Normalizing Flows and Correlation Analysis').

    Args:
        warmup: epochs of joint-VAE training (stage 1); afterwards the
            joint VAE is frozen and per-modality flows are trained to match
            the unimodal posteriors to the joint one. Requires the
            MultistageTrainer (reset_optimizer_epochs = [warmup + 1]).
        beta: weighs the joint-VAE KL regularization.
    """

    warmup: int = 10
    beta: float = 1.0
