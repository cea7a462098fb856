"""MoPoE config (reference ``src/multivae/models/mopoe/mopoe_config.py``)."""

from __future__ import annotations

from typing import Dict, List, Union

from pydantic.dataclasses import dataclass

from ..base.base_config import BaseMultiVAEConfig


@dataclass
class MoPoEConfig(BaseMultiVAEConfig):
    """Config for the MoPoE model ('Generalized Multimodal ELBO', ICLR 2021).

    Args:
        subsets: the modality subsets forming the mixture. None = all
            non-empty subsets (2^M - 1).
        beta: KL weight in the ELBO.
        beta_style: weight for per-modality private KLs (multi-latent mode).
        modalities_specific_dim: modality -> private latent dim; enables
            multiple latent spaces when provided.
    """

    subsets: Union[List[list], Dict[str, list], None] = None
    beta: float = 1.0
    beta_style: float = 1.0
    modalities_specific_dim: Union[dict, None] = None
