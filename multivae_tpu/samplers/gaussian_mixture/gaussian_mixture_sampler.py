"""Gaussian-mixture sampler over the model's latent space(s).

Reference:
``src/multivae/samplers/gaussian_mixture/gaussian_mixture_sampler.py``.
The default backend fits the full-covariance GMM ON DEVICE as one
compiled EM program (``ops/gmm.py``) and samples on device — no host
round trips besides the final latents; ``fit_backend="sklearn"`` keeps
the reference's host fit (an offline operation, SURVEY §7.1).
"""

from __future__ import annotations

import logging

import numpy as np

import jax
import jax.numpy as jnp

from ...ops import gmm as gmm_ops
from ...utils.model_output import ModelOutput
from ..base.base_sampler import BaseSampler
from .gaussian_mixture_config import GaussianMixtureSamplerConfig

logger = logging.getLogger(__name__)


class GaussianMixtureSampler(BaseSampler):
    """Fits a full-covariance GMM per latent space."""

    def __init__(self, model, sampler_config=None):
        if sampler_config is None:
            sampler_config = GaussianMixtureSamplerConfig()
        super().__init__(model, sampler_config)
        self.n_components = sampler_config.n_components
        self.fit_backend = getattr(sampler_config, "fit_backend", "jax")
        self.seed = getattr(sampler_config, "seed", 0)
        self._sample_calls = 0
        self.name = "GaussianMixtureSampler"

    def fit(self, train_data, **kwargs):
        """Encode the train set and fit a GMM per latent space
        (reference ``:51-113``)."""
        # jax backend: latents stay on device (fit_gmm consumes them
        # directly); sklearn needs host numpy arrays
        z, mod_z = self._collect_latents(
            train_data, device=(self.fit_backend == "jax"))

        if self.n_components > z.shape[0]:
            self.n_components = z.shape[0]
            logger.warning(
                "Setting the number of components to %d since n_components "
                "> n_samples when fitting the gmm", z.shape[0],
            )

        if self.fit_backend == "sklearn":
            from sklearn import mixture

            def fit_one(data, _i):
                g = mixture.GaussianMixture(
                    n_components=self.n_components, covariance_type="full",
                    max_iter=2000, verbose=0, tol=1e-3,
                )
                g.fit(np.asarray(data))
                return g
        else:
            def fit_one(data, i):
                return gmm_ops.fit_gmm(
                    jnp.asarray(data), self.n_components,
                    jax.random.key(self.seed + i))

        self.gmm = fit_one(z, 0)
        if mod_z is not None:
            self.mod_gmms = {m: fit_one(v, 1 + i)
                             for i, (m, v) in enumerate(mod_z.items())}
        self.is_fitted = True

    def _draw(self, g, n_samples: int):
        if self.fit_backend == "sklearn":
            return jnp.asarray(g.sample(n_samples)[0].astype(np.float32))
        # Fresh subkey per call so repeated sample() calls differ, as
        # the reference's (global-state) sampling does.
        self._sample_calls += 1
        rng = jax.random.fold_in(
            jax.random.key(self.seed), self._sample_calls)
        return gmm_ops.sample_gmm(g, rng, n_samples)

    def sample(self, n_samples: int = 1, batch_size: int = 500,
               **kwargs) -> ModelOutput:
        """Sample latents matching the ``model.encode`` output format
        (reference ``:116-174``)."""
        if not self.is_fitted:
            raise ArithmeticError(
                "The sampler needs to be fitted by calling sampler.fit() "
                "method before sampling."
            )
        output = ModelOutput(
            z=self._draw(self.gmm, n_samples),
            one_latent_space=not self.model.multiple_latent_spaces,
        )
        if self.model.multiple_latent_spaces:
            output["modalities_z"] = {
                m: self._draw(g, n_samples)
                for m, g in self.mod_gmms.items()
            }
        return output
