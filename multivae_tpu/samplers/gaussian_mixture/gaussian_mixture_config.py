"""GMM sampler config (reference
``src/multivae/samplers/gaussian_mixture/gaussian_mixture_config.py``)."""

from __future__ import annotations

from pydantic.dataclasses import dataclass

from ..base.base_sampler_config import BaseSamplerConfig


@dataclass
class GaussianMixtureSamplerConfig(BaseSamplerConfig):
    """Gaussian mixture sampler config.

    Args:
        n_components: number of Gaussians in the mixture.
    """

    n_components: int = 10
