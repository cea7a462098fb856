"""Gaussian-mixture sampler over the model's latent space(s).

Reference:
``src/multivae/samplers/gaussian_mixture/gaussian_mixture_sampler.py``.
The GMM fit is sklearn on the host (an offline operation, as in the
reference — SURVEY §7.1 "keep sklearn on host"); encoding the dataset and
decoding samples run on device.
"""

from __future__ import annotations

import logging

import numpy as np

import jax.numpy as jnp

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
        self.name = "GaussianMixtureSampler"

    def fit(self, train_data, **kwargs):
        """Encode the train set and fit a GMM per latent space
        (reference ``:51-113``)."""
        from sklearn import mixture

        z, mod_z = self._collect_latents(train_data)

        if self.n_components > z.shape[0]:
            self.n_components = z.shape[0]
            logger.warning(
                "Setting the number of components to %d since n_components "
                "> n_samples when fitting the gmm", z.shape[0],
            )

        def fit_gmm(data):
            gmm = mixture.GaussianMixture(
                n_components=self.n_components, covariance_type="full",
                max_iter=2000, verbose=0, tol=1e-3,
            )
            gmm.fit(np.asarray(data))
            return gmm

        self.gmm = fit_gmm(z)
        if mod_z is not None:
            self.mod_gmms = {m: fit_gmm(v) for m, v in mod_z.items()}
        self.is_fitted = True

    def sample(self, n_samples: int = 1, batch_size: int = 500,
               **kwargs) -> ModelOutput:
        """Sample latents matching the ``model.encode`` output format
        (reference ``:116-174``)."""
        if not self.is_fitted:
            raise ArithmeticError(
                "The sampler needs to be fitted by calling sampler.fit() "
                "method before sampling."
            )
        z = self.gmm.sample(n_samples)[0].astype(np.float32)
        output = ModelOutput(
            z=jnp.asarray(z),
            one_latent_space=not self.model.multiple_latent_spaces,
        )
        if self.model.multiple_latent_spaces:
            output["modalities_z"] = {
                m: jnp.asarray(g.sample(n_samples)[0].astype(np.float32))
                for m, g in self.mod_gmms.items()
            }
        return output
