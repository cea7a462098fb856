"""DMVAE config (reference ``src/multivae/models/dmvae/dmvae_config.py``)."""

from __future__ import annotations

from typing import Union

from pydantic.dataclasses import dataclass

from ..base.base_config import BaseMultiVAEConfig


@dataclass
class DMVAEConfig(BaseMultiVAEConfig):
    """Config for DMVAE ('Private-Shared Disentangled Multimodal VAE for
    Learning of Latent Representations').

    Args:
        modalities_specific_dim: private latent dims per modality.
        modalities_specific_betas: betas for private KL terms.
        beta: scaling for the shared divergence term.
    """

    modalities_specific_dim: Union[dict, None] = None
    modalities_specific_betas: Union[dict, None] = None
    beta: float = 1.0
