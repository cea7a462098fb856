"""MMVAE+ config (reference ``src/multivae/models/mmvaePlus/mmvaePlus_config.py``)."""

from __future__ import annotations

from typing import Literal, Union

from pydantic.dataclasses import dataclass

from ..base.base_config import BaseMultiVAEConfig


@dataclass
class MMVAEPlusConfig(BaseMultiVAEConfig):
    """Config for MMVAE+ ('MMVAE+: Enhancing the Generative Quality of
    Multimodal VAEs without Compromises', ICLR 2023).

    Args:
        K: number of importance samples in the objective.
        prior_and_posterior_dist: 'laplace_with_softmax', 'normal' or
            'normal_with_softplus'.
        learn_shared_prior: learn the shared prior log-variance.
        learn_modality_prior: learn the modality priors' log-variance.
        beta: regularizes the divergence term (used with K = 1).
        modalities_specific_dim: dimension of the private latent spaces
            (an int, shared across modalities).
        reconstruction_option: 'single_prior' or 'joint_prior' — which prior
            to use for the private code at cross-modal generation time.
        loss: 'dreg_looser' or 'iwae_looser'.
    """

    K: int = 10
    prior_and_posterior_dist: Literal[
        "laplace_with_softmax", "normal", "normal_with_softplus"
    ] = "laplace_with_softmax"
    learn_shared_prior: bool = False
    learn_modality_prior: bool = True
    beta: float = 1.0
    modalities_specific_dim: Union[int, None] = None
    reconstruction_option: Literal["single_prior", "joint_prior"] = "joint_prior"
    loss: Literal["dreg_looser", "iwae_looser"] = "dreg_looser"
