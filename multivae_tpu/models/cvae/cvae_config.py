"""CVAE config (reference ``src/multivae/models/cvae/cvae_config.py``)."""

from __future__ import annotations

from typing import Dict, List, Literal, Optional, Tuple

import pydantic
from pydantic.dataclasses import dataclass

from ...utils.config import BaseConfig


@dataclass(config=pydantic.ConfigDict(extra="allow"))
class CVAEConfig(BaseConfig):
    """Config for the Conditional Variational Autoencoder.

    Args:
        conditioning_modalities: modalities to condition on.
        main_modality: the modality to reconstruct.
        input_dims: modality name -> input shape.
        latent_dim: latent space dimension.
        beta: KL weight in the ELBO.
        decoder_dist: decoder distribution name.
        decoder_dist_params: extra params for the decoder distribution.
    """

    conditioning_modalities: List[str] = pydantic.Field(default_factory=list)
    main_modality: str = ""
    input_dims: Optional[Dict[str, Tuple[int, ...]]] = None
    latent_dim: int = 10
    beta: float = 1.0
    decoder_dist: Literal[
        "normal", "laplace", "bernoulli", "categorical"
    ] = "normal"
    decoder_dist_params: dict = pydantic.Field(default_factory=dict)
    custom_architectures: List[str] = pydantic.Field(default_factory=list)
