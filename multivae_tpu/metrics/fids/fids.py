"""FID evaluator: Fréchet distance per modality and conditioning subset.

Reference: ``src/multivae/metrics/fids/fids.py``. The embedding networks
are arbitrary callables (array -> embedding); by default an InceptionV3
port is loaded from converted weights (``inception_networks.py``), and the
tests/custom path accepts user embedders exactly like the reference's
``custom_encoders``. The matrix square root uses scipy (host, offline).
"""

from __future__ import annotations

from itertools import combinations
from typing import Dict, Optional

import numpy as np

import jax

from ...utils.model_output import ModelOutput
from ..base.evaluator_class import Evaluator
from .fids_config import FIDEvaluatorConfig


class AdaptShapeFID:
    """Make every sample (3, 299, 299) for the Inception embedder.

    Reference ``AdaptShapeFID`` (``fids.py:24-59``).
    """

    def __init__(self, resize: bool = True, size=(299, 299)):
        self.resize = resize
        self.size = size

    def __call__(self, x):
        x = np.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        if x.ndim == 2:
            x = x[:, None]
        if x.ndim == 3:
            x = x[:, None]
        if x.ndim != 4:
            raise AttributeError(
                "Can't compute FID for data with more than 3 dimensions"
            )
        if x.shape[1] == 1:
            x = np.concatenate([x] * 3, axis=1)
        elif x.shape[1] == 2:
            n, _, h, w = x.shape
            x = np.concatenate([x, np.zeros((n, 1, h, w), x.dtype)], axis=1)
        else:
            x = x[:, :3]
        if self.resize:
            x = jax.image.resize(
                x, (x.shape[0], x.shape[1], *self.size), method="bilinear"
            )
        return x


class FIDEvaluator(Evaluator):
    """Fréchet distance metrics.

    Args:
        model / test_dataset / output / eval_config / sampler: see Evaluator.
        custom_encoders: modality -> callable(array) -> embedding to use
            instead of InceptionV3.
        transform: preprocessing applied before embedding (default: the
            FID shape adapter when using Inception).
    """

    def __init__(self, model, test_dataset, output=None, eval_config=None,
                 sampler=None, custom_encoders: Optional[Dict] = None,
                 transform=None):
        if eval_config is None:
            eval_config = FIDEvaluatorConfig()
        super().__init__(model, test_dataset, output, eval_config, sampler)

        if custom_encoders is not None:
            self.model_fds = dict(custom_encoders)
        else:
            from .inception_networks import wrapper_inception

            self.model_fds = {
                m: wrapper_inception(
                    dims=eval_config.dims_inception,
                    path_weights=eval_config.inception_weights_path,
                )
                for m in model.encoders
            }
        if transform is not None:
            self.inception_transform = transform
        elif custom_encoders is None:
            self.inception_transform = AdaptShapeFID()
        else:
            self.inception_transform = None

    # ----------------------------------------------------------------- core
    def _embed(self, mod, data):
        if self.inception_transform is not None:
            data = self.inception_transform(data)
        pred = self.model_fds[mod](data)
        if isinstance(pred, dict):
            pred = pred["embedding"]
        return np.asarray(pred)

    def get_frechet_distance(self, mod, generate_latent_function):
        """Activations for true + generated data, then Fréchet distance
        (reference ``:112-156``)."""
        acts_true, acts_gen = [], []
        for batch in self.test_loader:
            valid = np.asarray(batch.weights) > 0
            true_data = np.asarray(batch.data[mod])[valid]
            acts_true.append(self._embed(mod, true_data))

            latents = generate_latent_function(int(valid.sum()),
                                               inputs=batch)
            samples = self.model.decode(latents, modalities=mod)
            gen = np.asarray(samples[mod])
            if gen.shape[0] != int(valid.sum()):
                gen = gen[valid]
            acts_gen.append(self._embed(mod, gen))

        act_true = np.concatenate(acts_true, axis=0)
        act_gen = np.concatenate(acts_gen, axis=0)
        mu1, mu2 = act_true.mean(0), act_gen.mean(0)
        s1 = np.cov(act_true, rowvar=False)
        s2 = np.cov(act_gen, rowvar=False)
        return self.calculate_frechet_distance(mu1, s1, mu2, s2)

    def calculate_frechet_distance(self, mu1, sigma1, mu2, sigma2,
                                   eps: float = 1e-6):
        """Stable Fréchet distance (reference ``:158-218``)."""
        from scipy import linalg

        mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
        sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
        assert mu1.shape == mu2.shape
        assert sigma1.shape == sigma2.shape

        diff = mu1 - mu2
        covmean = linalg.sqrtm(sigma1.dot(sigma2))
        if not np.isfinite(covmean).all():
            self.logger.info(
                "fid calculation produces singular product; adding %s to "
                "diagonal of cov estimates", eps,
            )
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
        if np.iscomplexobj(covmean):
            if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
                raise ValueError(
                    f"Imaginary component {np.max(np.abs(covmean.imag))}"
                )
            covmean = covmean.real
        return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                - 2 * np.trace(covmean))

    # ------------------------------------------------------------ use-cases
    def unconditional_fids(self):
        """FID per modality for prior/sampler generations
        (reference ``:220-240``)."""
        output = {}
        if self.sampler is None:
            def generate_function(n, inputs=None):
                return self.model.generate_from_prior(n)
        else:
            def generate_function(n, inputs=None):
                return self.sampler.sample(n)

        sampler_name = "prior" if self.sampler is None else self.sampler.name
        for mod in self.model.encoders:
            self.logger.info("Start computing FID for modality %s", mod)
            fd = self.get_frechet_distance(mod, generate_function)
            output[f"fd_{mod}_sampler_{sampler_name}"] = fd
            self.logger.info(
                "The FD for modality %s with sampler %s is %s", mod,
                sampler_name, fd,
            )
        self.metrics.update(output)
        return ModelOutput(**output)

    def eval(self):
        self.unconditional_fids()
        self.log_to_wandb()
        return ModelOutput(**self.metrics)

    def compute_fid_from_conditional_generation(self, subset, gen_mod):
        """Reference ``:248-263``."""
        def generate_function(n_samples, inputs):
            return self.model.encode(inputs=inputs, cond_mod=subset,
                                     ignore_incomplete=True)

        fd = self.get_frechet_distance(gen_mod, generate_function)
        self.logger.info(
            "The FD for modality %s computed from subset=%s is %s", gen_mod,
            subset, fd,
        )
        subset_name = "_".join(subset)
        self.metrics[f"Conditional FD from {subset_name} to {gen_mod}"] = fd
        return fd

    def compute_all_conditional_fids(self, gen_mod):
        """Reference ``:265-283``."""
        modalities = [k for k in self.model.encoders if k != gen_mod]
        for n in range(1, len(modalities) + 1):
            fdn = []
            for s in combinations(modalities, n):
                fd = self.compute_fid_from_conditional_generation(
                    list(s), gen_mod)
                fdn.append(fd)
                self.metrics[
                    f"Mean FD from {n} modalities to {gen_mod}"
                ] = float(np.mean(fdn))
        return ModelOutput(**self.metrics)
