"""BaseSampler: fit/sample contract over the model's latent space(s).

Reference: ``src/multivae/samplers/base/base_sampler.py``. The contract:
``sample()`` returns the same ModelOutput(z, one_latent_space[,
modalities_z]) format as ``model.encode`` so decoded generations work the
same way.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from ...data.loader import DataLoader

logger = logging.getLogger(__name__)


class BaseSampler:
    """Base class for post-hoc latent samplers."""

    def __init__(self, model, sampler_config=None):
        from .base_sampler_config import BaseSamplerConfig

        if sampler_config is None:
            sampler_config = BaseSamplerConfig()
        self.model = model
        self.sampler_config = sampler_config
        self.is_fitted = False
        self.name = "BaseSampler"

    def fit(self, train_data, **kwargs):
        """Fit the sampler before sampling."""
        return

    def sample(self, n_samples: int = 1, batch_size: int = 500,
               **kwargs):
        raise NotImplementedError()

    def save(self, dir_path: str):
        """Save the sampler config as ``sampler_config.json``."""
        logger.info("Saving sampler in %s.", dir_path)
        os.makedirs(dir_path, exist_ok=True)
        self.sampler_config.save_json(dir_path, "sampler_config")

    # ------------------------------------------------------------- helpers
    def _collect_latents(self, dataset, batch_size: int = 100, rng=None):
        """Encode the whole dataset; returns (z, modalities_z or None) as
        numpy arrays (padding rows removed)."""
        loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                            drop_last=False)
        zs = []
        mod_zs = ({m: [] for m in self.model.encoders}
                  if self.model.multiple_latent_spaces else None)
        for batch in loader:
            out = self.model.encode(batch, rng=rng)
            valid = np.asarray(batch.weights) > 0
            zs.append(np.asarray(out.z)[valid])
            if mod_zs is not None:
                for m in mod_zs:
                    mod_zs[m].append(np.asarray(out.modalities_z[m])[valid])
        z = np.concatenate(zs, axis=0)
        if mod_zs is not None:
            mod_zs = {m: np.concatenate(v, axis=0) for m, v in mod_zs.items()}
        return z, mod_zs
