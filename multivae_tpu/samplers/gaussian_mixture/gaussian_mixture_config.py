"""GMM sampler config (reference
``src/multivae/samplers/gaussian_mixture/gaussian_mixture_config.py``)."""

from __future__ import annotations

from typing import Literal

from pydantic.dataclasses import dataclass

from ..base.base_sampler_config import BaseSamplerConfig


@dataclass
class GaussianMixtureSamplerConfig(BaseSamplerConfig):
    """Gaussian mixture sampler config.

    Args:
        n_components: number of Gaussians in the mixture.
        fit_backend: ``"jax"`` (default) fits the full-covariance GMM
            on device as ONE compiled EM program (``ops/gmm.py`` —
            k-means++ seeding, batched-Cholesky E-step,
            ``lax.while_loop`` convergence) and samples on device;
            ``"sklearn"`` reproduces the reference's host fit
            (``gaussian_mixture_sampler.py:89-96``). Both use
            ``max_iter=2000, tol=1e-3`` on the mean log-likelihood.
        seed: RNG seed for the device fit's k-means++ seeding and for
            device sampling (the sklearn backend, like the reference,
            draws from numpy's global state).
    """

    n_components: int = 10
    fit_backend: Literal["jax", "sklearn"] = "jax"
    seed: int = 0
