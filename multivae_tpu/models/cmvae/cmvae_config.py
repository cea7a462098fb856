"""CMVAE config (reference ``src/multivae/models/cmvae/cmvae_config.py``)."""

from __future__ import annotations

from typing import Literal, Union

from pydantic.dataclasses import dataclass

from ..base.base_config import BaseMultiVAEConfig


@dataclass
class CMVAEConfig(BaseMultiVAEConfig):
    """Config for CMVAE ('Deep Generative Clustering with Multimodal
    Diffusion Variational Autoencoders', Palumbo et al 2023 — without the
    diffusion decoders, like the reference).

    Args:
        K: number of importance samples in the objective.
        prior_and_posterior_dist: 'laplace_with_softmax', 'normal' or
            'normal_with_softplus'.
        learn_modality_prior: learn the modality priors' log-variance.
        beta: weights the KL block.
        modalities_specific_dim: dimension of the private latent spaces.
        reconstruction_option: 'single_prior' or 'joint_prior'.
        loss: 'dreg_looser' or 'iwae_looser'.
        number_of_clusters: number of mixture components of the clustering
            prior on the shared latent space.
    """

    K: int = 10
    prior_and_posterior_dist: Literal[
        "laplace_with_softmax", "normal", "normal_with_softplus"
    ] = "laplace_with_softmax"
    learn_modality_prior: bool = True
    beta: float = 1.0
    modalities_specific_dim: Union[int, None] = None
    reconstruction_option: Literal["single_prior", "joint_prior"] = "joint_prior"
    loss: Literal["iwae_looser", "dreg_looser"] = "dreg_looser"
    number_of_clusters: int = 10
    learn_shared_prior: bool = False  # unused; kept for MMVAE+ base compat
