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
    def _per_sample_masked_encode_supported(self) -> bool:
        """Can this model encode a batch whose rows each miss a different
        modality subset in ONE program? True for the PoE families
        (``supports_per_sample_conditioning``): their ``_encode_masked``
        folds ``batch.masks`` into the precision product per sample, so
        incomplete rows condition on exactly their available modalities
        (the same contract ``serving.AnySubsetPredictor`` relies on)."""
        m = self.model
        return (m._encode_masked is not None
                and getattr(m, "supports_per_sample_conditioning", False))

    def _masked_encode_one(self):
        """Per-batch cond='all' masked encode (jit-compatible pure fn of
        ``(params, batch, rng)``) shared by the device scan and the
        incomplete-data host loop. Models with a per-row
        posterior-vs-prior select (DMVAE) opt into ``per_sample=True``:
        each row's available modalities ARE its conditioning set, the
        natural incomplete-data fit semantics (missing private codes draw
        from their N(0, I) prior instead of a posterior over garbage)."""
        from functools import partial

        model = self.model
        cond = model._normalize_cond_mod("all")
        if model._encode_masked is not None:
            kw = {}
            if getattr(model, "masked_encode_per_sample_flag", False):
                kw["per_sample"] = True
            sub = model.subset_indicator(cond)
            enc = partial(model._encode_masked, N=1, return_mean=False,
                          flatten=False, **kw)
            return lambda params, batch, r: enc(params, batch, r, sub)
        return partial(model._encode_subset, cond_mod=cond, N=1,
                       return_mean=False, flatten=False)

    def _collect_latents(self, dataset, batch_size: int = 100, rng=None,
                         device: bool = False):
        """Encode the whole dataset; returns (z, modalities_z or None)
        with padding rows removed.

        ``device=False`` (default): the reference-shaped host loop —
        numpy arrays, one ``model.encode`` dispatch + fetch per batch.
        ``device=True``: the whole collection is device-resident — the
        dataset uploads ONCE (memoized on the dataset object, so repeat
        fits and sibling samplers reuse the transfer) and a single
        ``lax.scan`` program gathers + encodes every batch, returning z
        as a DEVICE array that flow/GMM fits consume with zero further
        transfers. On the tunneled TPU the host loop's per-batch
        upload/dispatch/fetch round trips dominated the entire MAF fit
        (measured: the flow-training scan itself is ~milliseconds);
        falls back to the host loop when the dataset can't be cached.

        Incomplete datasets: models whose masked encode is fully
        per-sample (the PoE families) fit on partial data by
        conditioning each row on ITS available modalities — in-graph,
        on both paths (the reference never fits a sampler on partial
        data; its samplers script loads ``missing_ratio=0``,
        ``benchmarking_on_partial_polymnist/samplers.py:22`` +
        ``global_config.py:111``). Mixture-selection models keep
        ``model.encode``'s availability error."""
        if device:
            out = self._collect_latents_device(dataset, batch_size, rng)
            if out is not None:
                return out
        loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                            drop_last=False)
        zs = []
        mod_zs = ({m: [] for m in self.model.encoders}
                  if self.model.multiple_latent_spaces else None)
        masked_fn = None
        for batch in loader:
            if batch.incomplete and self._per_sample_masked_encode_supported():
                # per-sample masked encode (same in-graph availability
                # semantics as the device scan); public encode keeps its
                # reference error path for mixture-selection models
                if masked_fn is None:
                    import jax

                    masked_fn = jax.jit(self._masked_encode_one())
                r = rng if rng is not None else self.model.next_rng()
                out = masked_fn(self.model._ensure_params(), batch, r)
                out_z, out_mods = out["z"], out.get("modalities_z")
            else:
                out = self.model.encode(batch, rng=rng)
                out_z = out.z
                out_mods = (out.modalities_z if mod_zs is not None else None)
            valid = np.asarray(batch.weights) > 0
            zs.append(np.asarray(out_z)[valid])
            if mod_zs is not None:
                for m in mod_zs:
                    mod_zs[m].append(np.asarray(out_mods[m])[valid])
        z = np.concatenate(zs, axis=0)
        if mod_zs is not None:
            mod_zs = {m: np.concatenate(v, axis=0) for m, v in mod_zs.items()}
        return z, mod_zs

    _collect_fn = None

    def _collect_latents_device(self, dataset, batch_size: int, rng=None):
        """Device-resident latent collection (see ``_collect_latents``);
        returns (z, mod_z) as device arrays, or None to fall back."""
        import jax
        import jax.numpy as jnp

        from ...data.device_cache import build_device_cache
        from ...parallel.mesh import get_data_mesh

        model = self.model
        cache = getattr(dataset, "_sampler_device_cache", None)
        if cache is None:
            budget = int(getattr(self.sampler_config,
                                 "device_cache_budget_gb", 8.0) * 1e9)
            try:
                cache = build_device_cache(dataset, get_data_mesh(1), budget)
            except Exception:
                logger.info("sampler device cache build failed; using the "
                            "host encode loop", exc_info=True)
                return None
            if cache is None:
                return None
            try:
                # memoize the upload on the dataset: repeat fits (and any
                # other sampler over the same data) skip the transfer
                dataset._sampler_device_cache = cache
            except Exception:  # pragma: no cover - exotic dataset types
                pass
        if cache.incomplete and not self._per_sample_masked_encode_supported():
            # mixture-selection models keep model.encode's
            # availability-check semantics (the host loop raises)
            return None

        loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                            drop_last=False)
        idx_rows, w_rows = loader.epoch_plan()
        n = len(dataset)
        params = model._ensure_params()
        if rng is None:
            rng = model.next_rng()

        if self._collect_fn is None:
            encode_one = self._masked_encode_one()
            collect_mods = model.multiple_latent_spaces

            @jax.jit
            def collect(params, cache, idx_mat, w_mat, rngs):
                def step(_, xs):
                    ii, ww, r = xs
                    batch = cache.gather(ii, ww)
                    out = encode_one(params, batch, r)
                    mods = (out["modalities_z"] if collect_mods else None)
                    return None, (out["z"], mods)

                _, (z, mods) = jax.lax.scan(
                    step, None, (idx_mat, w_mat, rngs))
                flat = lambda x: x.reshape((-1,) + x.shape[2:])  # noqa: E731
                return (flat(z),
                        None if mods is None else jax.tree.map(flat, mods))

            self._collect_fn = collect

        rngs = jax.random.split(rng, len(idx_rows))
        z, mods = self._collect_fn(params, cache,
                                   jnp.asarray(np.stack(idx_rows)),
                                   jnp.asarray(np.stack(w_rows)), rngs)
        # shuffle=False keeps dataset order, so padding rows (if any) sit
        # at the tail of the LAST batch: drop them with one device slice
        z = z[:n]
        if mods is not None:
            mods = {m: v[:n] for m, v in mods.items()}
        return z, mods
