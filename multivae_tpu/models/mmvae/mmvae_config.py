"""MMVAE config (reference ``src/multivae/models/mmvae/mmvae_config.py``)."""

from __future__ import annotations

from typing import Literal

from pydantic.dataclasses import dataclass

from ..base.base_config import BaseMultiVAEConfig


@dataclass
class MMVAEConfig(BaseMultiVAEConfig):
    """Config for MMVAE ('Variational Mixture-of-Experts Autoencoders for
    Multi-Modal Deep Generative Models', NeurIPS 2019).

    Args:
        K: number of importance samples in the objective.
        prior_and_posterior_dist: 'laplace_with_softmax' or 'normal'.
        learn_prior: make the prior log-variance learnable.
        loss: 'dreg_looser' or 'iwae_looser'.
    """

    K: int = 10
    prior_and_posterior_dist: Literal[
        "laplace_with_softmax", "normal"
    ] = "laplace_with_softmax"
    learn_prior: bool = True
    loss: Literal["dreg_looser", "iwae_looser"] = "dreg_looser"
