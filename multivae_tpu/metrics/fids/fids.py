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
from ..base.subset_sweep import is_fused_fallback_error
from .fids_config import FIDEvaluatorConfig


class AdaptShapeFID:
    """Make every sample (3, 299, 299) for the Inception embedder.

    Reference ``AdaptShapeFID`` (``fids.py:24-59``).
    """

    def __init__(self, resize: bool = True, size=(299, 299)):
        self.resize = resize
        self.size = size

    def __call__(self, x):
        # jnp throughout: shapes/ndim are static, so this adapter is
        # jit-traceable and runs in-graph inside the fused subset sweep
        import jax.numpy as jnp

        x = jnp.asarray(x)
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
            x = jnp.concatenate([x] * 3, axis=1)
        elif x.shape[1] == 2:
            n, _, h, w = x.shape
            x = jnp.concatenate(
                [x, jnp.zeros((n, 1, h, w), x.dtype)], axis=1)
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

    def _subset_chunk(self, batch, gen_mod):
        """How many subsets the fused conditional-FID sweep may embed
        concurrently: explicit ``eval_config.subset_chunk`` if set, else
        sized so chunk x (embedder input bytes x ~8 activation overhead)
        fits ``subset_activation_budget_gb``. Shape-only (``eval_shape``);
        nothing is compiled or allocated here."""
        cfg = self.eval_config
        explicit = getattr(cfg, "subset_chunk", None)
        if explicit is not None:
            return int(explicit)
        import jax.numpy as jnp

        transform = self.inception_transform
        x = jax.ShapeDtypeStruct(
            tuple(batch.data[gen_mod].shape), jnp.float32)
        try:
            emb_in = jax.eval_shape(transform, x) if transform is not None \
                else x
        except Exception:  # pragma: no cover - exotic transforms
            emb_in = x
        per_subset = int(np.prod(emb_in.shape)) * 4 * 8
        budget = float(
            getattr(cfg, "subset_activation_budget_gb", 4.0)) * 1e9
        return max(1, int(budget // max(per_subset, 1)))

    def _fused_conditional_fids(self, gen_mod):
        """All conditioning subsets in ONE compiled device call per test
        batch: traced-subset encode + decode + (transform + embedder)
        in-graph; only (S, B, emb_dim) activations return to the host,
        where the Fréchet statistics stay numerically identical to the
        sequential path. Returns None when the model/embedder can't run
        fused (fall back to the per-subset loop)."""
        from ..base.subset_sweep import (
            all_subsets,
            make_subset_sweep_fn,
            subset_rngs,
        )

        model = self.model
        if getattr(model, "_encode_masked", None) is None:
            return None
        modalities = [k for k in model.encoders if k != gen_mod]
        subsets = all_subsets(modalities)
        transform = self.inception_transform
        embedder = self.model_fds[gen_mod]

        def post(recon, batch):
            x = transform(recon) if transform is not None else recon
            out = embedder(x)
            if isinstance(out, dict):
                out = out["embedding"]
            return out

        params = model._ensure_params()
        acts_true = []
        acts_gen = {s: [] for s in subsets}
        sweep = None
        for batch in self.test_loader:
            valid = np.asarray(batch.weights) > 0
            true_data = np.asarray(batch.data[gen_mod])[valid]
            acts_true.append(self._embed(gen_mod, true_data))
            rngs = subset_rngs(model, len(subsets))
            if sweep is None:
                # chunk the subset axis so the in-graph embedder's
                # activations stay within budget (all 2^(M-1)-1 subsets
                # vmapped through a 299x299 Inception would OOM the chip)
                sweep = make_subset_sweep_fn(
                    model, subsets, N=1, postprocess={gen_mod: post},
                    gen_mods=(gen_mod,),
                    subset_chunk=self._subset_chunk(batch, gen_mod))
                if sweep is None:
                    return None
                try:
                    acts_dev = sweep(params, batch, rngs)
                except Exception as e:
                    # non-jittable embedder/transform or device OOM only
                    # (see is_fused_fallback_error); real bugs raise
                    if not is_fused_fallback_error(e):
                        raise
                    self.logger.warning(
                        "fused conditional-FID sweep unavailable "
                        "(%s); falling back to the per-subset "
                        "loop", e)
                    return None
            else:
                acts_dev = sweep(params, batch, rngs)
            acts = np.asarray(acts_dev[gen_mod])
            for si, s in enumerate(subsets):
                acts_gen[s].append(acts[si][valid])

        act_true = np.concatenate(acts_true, axis=0)
        mu1 = act_true.mean(0)
        s1 = np.cov(act_true, rowvar=False)
        out = {}
        for s in subsets:
            act = np.concatenate(acts_gen[s], axis=0)
            fd = self.calculate_frechet_distance(
                mu1, s1, act.mean(0), np.cov(act, rowvar=False))
            self.logger.info(
                "The FD for modality %s computed from subset=%s is %s",
                gen_mod, list(s), fd,
            )
            out[s] = fd
        return out

    def compute_all_conditional_fids(self, gen_mod):
        """Reference ``:265-283``. With ``fused_sweep`` (default) the
        whole subset sweep is one device call per batch (see
        ``_fused_conditional_fids``); metric keys and running-mean
        semantics are unchanged."""
        modalities = [k for k in self.model.encoders if k != gen_mod]
        per_subset = None
        if getattr(self.eval_config, "fused_sweep", True):
            per_subset = self._fused_conditional_fids(gen_mod)
        for n in range(1, len(modalities) + 1):
            fdn = []
            for s in combinations(modalities, n):
                if per_subset is not None:
                    fd = per_subset[s]
                    self.metrics[
                        f"Conditional FD from {'_'.join(s)} to {gen_mod}"
                    ] = fd
                else:
                    fd = self.compute_fid_from_conditional_generation(
                        list(s), gen_mod)
                fdn.append(fd)
                self.metrics[
                    f"Mean FD from {n} modalities to {gen_mod}"
                ] = float(np.mean(fdn))
        return ModelOutput(**self.metrics)
