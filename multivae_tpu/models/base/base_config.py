"""Base model configs (reference ``src/multivae/models/base/base_config.py``)."""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import pydantic
from pydantic.dataclasses import dataclass

from ...utils.config import BaseConfig, EnvironmentConfig  # noqa: F401


@dataclass(config=pydantic.ConfigDict(extra="allow"))
class BaseMultiVAEConfig(BaseConfig):
    """Base config for multimodal VAE models.

    Args:
        n_modalities: number of modalities.
        latent_dim: dimension of the (shared) latent space.
        input_dims: modality name -> input shape tuple.
        uses_likelihood_rescaling: rescale reconstruction log-probs per
            modality to mitigate modality collapse.
        rescale_factors: explicit per-modality rescale factors.
        decoders_dist: per-modality decoder distribution name in
            {'normal','bernoulli','laplace','categorical'}.
        decoder_dist_params: per-modality dist params (e.g. {'scale': 0.75}).
        custom_architectures: names of user-supplied network groups, tracked
            for save/load.
        use_remat: rematerialize encoder/decoder activations in the
            backward pass (jax.checkpoint) — trades FLOPs for HBM, enabling
            large K x batch x modality products that would otherwise OOM.
    """

    n_modalities: int = 1
    latent_dim: int = 10
    input_dims: Optional[Dict[str, Tuple[int, ...]]] = None
    uses_likelihood_rescaling: bool = False
    rescale_factors: Optional[Dict[str, float]] = None
    decoders_dist: Optional[Dict[str, str]] = None
    decoder_dist_params: Optional[dict] = None
    custom_architectures: List[str] = pydantic.Field(default_factory=list)
    use_remat: bool = False
