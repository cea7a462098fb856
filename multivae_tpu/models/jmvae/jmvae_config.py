"""JMVAE config (reference ``src/multivae/models/jmvae/jmvae_config.py``)."""

from __future__ import annotations

from pydantic.dataclasses import dataclass

from ..joint_models.joint_model_config import BaseJointModelConfig


@dataclass
class JMVAEConfig(BaseJointModelConfig):
    """Config for JMVAE ('Joint Multimodal Learning with Deep Generative
    Models').

    Args:
        alpha: weight of the KL(joint||unimodal) regularization terms.
        warmup: regularization annealed linearly over the first epochs.
        beta: weight of the prior KL.
    """

    alpha: float = 0.1
    warmup: int = 10
    beta: float = 1.0
