"""CMVAE: MMVAE+-style shared/private latents + Gaussian-mixture clustering
prior, TPU-native.

Behavior parity with reference ``src/multivae/models/cmvae/cmvae_model.py``:
learnable cluster means (fixed unit scales) + learnable mixture weights
pi = softmax(pc_params); the objective takes an explicit expectation over
q(c|z) (``cmvae_model.py:247-345``); cluster prediction by per-modality
majority vote (``:546-619``); entropy-based cluster pruning mutates
pc_params with -inf on the host (``:621-706``).

Shares the posterior/embedding/reconstruction machinery with MMVAEPlus
(subclassed); all cluster terms are batched over the cluster axis.
"""

from __future__ import annotations

import logging

import numpy as np

import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch, as_batch
from ...ops.kdist import (
    dist_log_prob,
    dist_rsample,
    log_var_to_std,
    mixture_logsumexp,
)
from ...utils.model_output import ModelOutput
from ..mmvaePlus.mmvaePlus_model import MMVAEPlus
from .cmvae_config import CMVAEConfig

logger = logging.getLogger(__name__)


class CMVAE(MMVAEPlus):
    """CMVAE model (clustering prior on the shared latent space)."""

    model_name = "CMVAE"

    def __init__(self, model_config: CMVAEConfig, encoders: dict = None,
                 decoders: dict = None, seed: int = 0):
        self.n_clusters = model_config.number_of_clusters
        super().__init__(model_config, encoders, decoders, seed=seed)

    def _init_extra_params(self, rng) -> dict:
        """Cluster means U(-1, 1) + mixture logits + modality priors.

        Reference ``cmvae_model.py:84-128``. Cluster scales and the w-prior
        are fixed (requires_grad=False) and therefore not stored in params.
        """
        extra = {}
        if self.model_config.learn_modality_prior:
            for m in self.encoders:
                extra[f"prior_log_var_{m}"] = jnp.zeros(
                    (1, self.modalities_specific_dim)
                )
        extra["pc_params"] = jnp.zeros((self.n_clusters,))
        extra["mean_clusters"] = (
            2.0 * jax.random.uniform(rng,
                                     (self.n_clusters, self.latent_dim)) - 1.0
        )
        return extra

    # cluster scales are fixed to 1 in the original code (log_var = 0).
    # Always sized to the ORIGINAL cluster count: pruning only zeroes the
    # mixture weights, it never shrinks the parameter arrays.
    def _cluster_stds(self, params):
        n = params["model"]["mean_clusters"].shape[0]
        lv = jnp.zeros((n, self.latent_dim),
                       params["model"]["mean_clusters"].dtype)
        return log_var_to_std(lv, self.dist_name)

    def _w_prior(self, dtype=jnp.float32):
        """Fixed regularizing prior p(w) (reference ``:100-106``)."""
        mu = jnp.zeros((1, self.modalities_specific_dim), dtype)
        std = log_var_to_std(jnp.zeros_like(mu), self.dist_name)
        return mu, std

    def pc_params_probs(self, params):
        return jax.nn.softmax(params["model"]["pc_params"], axis=-1)

    # -------------------------------------------------------------- objective
    def _compute_k_lws(self, params, batch, posteriors, zs, recons,
                       detach_posteriors: bool, beta: float = None,
                       unit_rescale: bool = False):
        """Vectorized reference ``_compute_k_lws`` (``cmvae_model.py:247-345``):
        cluster terms batched over the (C, M, K, B) layout."""
        beta = (self.model_config.beta if beta is None else beta)
        mods = list(posteriors.keys())
        mask = jnp.stack([batch.masks[m] for m in mods])
        n_mods_sample = jnp.maximum(mask.sum(0), 1.0)

        w_mu_p, w_std_p = self._w_prior(self.param_dtype(params))
        pc = self.pc_params_probs(params)
        lpc = jnp.log(pc)  # (C,)
        cluster_means = params["model"]["mean_clusters"]  # (C, D)
        cluster_stds = self._cluster_stds(params)

        U = jnp.stack([zs[m]["u"] for m in mods])  # (M, K, B, D)
        W = jnp.stack([zs[m]["w"] for m in mods])  # (M, K, B, S)

        # log p(w) under the fixed regularizing prior: (M, K, B)
        lpw = dist_log_prob(self.dist_name, W, w_mu_p,
                            w_std_p).sum(-1, dtype=jnp.float32)

        u_mu, u_sig, w_mu, w_sig = self._stacked_posteriors(
            posteriors, detach_posteriors
        )
        lqw_x = dist_log_prob(
            self.dist_name, W, w_mu[:, None], w_sig[:, None]
        ).sum(-1, dtype=jnp.float32)

        lqu_x = mixture_logsumexp(U, u_mu, u_sig, mask, self.dist_name) - (
            jnp.log(n_mods_sample)
        )

        # log p(z|c) for all clusters and modalities: (C, M, K, B)
        lpzc = dist_log_prob(
            self.dist_name, U[None], cluster_means[:, None, None, None, :],
            cluster_stds[:, None, None, None, :],
        ).sum(-1, dtype=jnp.float32)
        qzc = jax.nn.softmax(lpc[:, None, None, None] + lpzc, axis=0) + 1e-20

        lpx_z = 0.0
        for recon_mod in mods:
            lp = self.recon_log_probs[recon_mod](
                recons[recon_mod], batch.data[recon_mod][None, None]
            )
            factor = 1.0 if unit_rescale else self.rescale_factors[recon_mod]
            lp = lp.reshape(*lp.shape[:3], -1).sum(-1,
                                                    dtype=jnp.float32) * factor
            lp = lp * batch.masks[recon_mod][None, None, :]
            lpx_z = lpx_z + lp  # (M, K, B)

        # explicit expectation over q(c|z): (C, M, K, B) -> (M, K, B)
        lw_c = lpx_z[None] + beta * (
            lpc[:, None, None, None] + lpzc + lpw[None] - lqu_x[None]
            - lqw_x[None] - jnp.log(qzc)
        )
        lw = (qzc * lw_c).sum(0)
        lw = lw * mask[:, None, :]
        return {m: lw[i] for i, m in enumerate(mods)}, n_mods_sample

    # ----------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool) -> dict:
        """Reference ``encode`` (``cmvae_model.py:400-505``): always samples
        the shared code from ONE random conditioning modality (the mean of
        that modality when return_mean)."""
        posteriors = self._posteriors(params, batch, mods=cond_mod)
        B = batch.n_samples
        mus = jnp.stack([posteriors[m]["u"][0] for m in cond_mod])
        sigmas = jnp.stack([posteriors[m]["u"][1] for m in cond_mod])

        rng, choice_rng, sample_rng = jax.random.split(rng, 3)
        idx = jax.random.randint(choice_rng, (), 0, len(cond_mod))
        mu, sigma = mus[idx], sigmas[idx]
        if return_mean:
            z = jnp.broadcast_to(mu, (N, *mu.shape)) if N > 1 else mu
        else:
            z = dist_rsample(sample_rng, self.dist_name, mu, sigma,
                             K=1 if N == 1 else N)
        if flatten:
            z = z.reshape(-1, self.latent_dim)

        style_z = {}
        mod_rngs = jax.random.split(rng, len(self.encoders))
        for i, m in enumerate(self.encoders):
            if m not in cond_mod:
                if self.reconstruction_option == "single_prior":
                    mu_m, std_m = self._modality_prior(params, m)
                else:
                    mu_m, std_m = self._w_prior()
                mu_m = jnp.broadcast_to(mu_m, (B, mu_m.shape[-1]))
                std_m = jnp.broadcast_to(std_m, (B, std_m.shape[-1]))
            else:
                mu_m, std_m = posteriors[m]["w"]
            if return_mean:
                style_z[m] = (jnp.broadcast_to(mu_m, (N, *mu_m.shape))
                              if N > 1 else mu_m)
            else:
                style_z[m] = dist_rsample(mod_rngs[i], self.dist_name, mu_m,
                                          std_m, K=1 if N == 1 else N)
            if flatten:
                style_z[m] = style_z[m].reshape(
                    -1, self.modalities_specific_dim
                )
        return {"z": z, "modalities_z": style_z}

    def _encode_masked(self, params, batch: MultimodalBatch, rng, subset, *,
                       N: int, return_mean: bool, flatten: bool) -> dict:
        """Subset as a traced (M,) indicator (see ``MMVAE._encode_masked``);
        CMVAE semantics kept: return_mean returns the mean of the ONE
        randomly chosen conditioning modality, and the non-conditioning
        private prior follows ``reconstruction_option``."""
        posteriors = self._posteriors(params, batch)
        B = batch.n_samples
        mods = list(self.encoders)
        mus = jnp.stack([posteriors[m]["u"][0] for m in mods])
        sigmas = jnp.stack([posteriors[m]["u"][1] for m in mods])

        rng, choice_rng, sample_rng = jax.random.split(rng, 3)
        idx = jax.random.categorical(choice_rng, jnp.log(subset))
        mu, sigma = mus[idx], sigmas[idx]
        if return_mean:
            z = jnp.broadcast_to(mu, (N, *mu.shape)) if N > 1 else mu
        else:
            z = dist_rsample(sample_rng, self.dist_name, mu, sigma,
                             K=1 if N == 1 else N)
        if flatten:
            z = z.reshape(-1, self.latent_dim)

        style_z = {}
        mod_rngs = jax.random.split(rng, len(self.encoders))
        for i, m in enumerate(self.encoders):
            if self.reconstruction_option == "single_prior":
                pr_mu, pr_std = self._modality_prior(params, m)
            else:
                pr_mu, pr_std = self._w_prior()
            pr_mu = jnp.broadcast_to(pr_mu, (B, pr_mu.shape[-1]))
            pr_std = jnp.broadcast_to(pr_std, (B, pr_std.shape[-1]))
            po_mu, po_std = posteriors[m]["w"]
            sel = subset[i]
            mu_m = sel * po_mu + (1.0 - sel) * pr_mu
            std_m = sel * po_std + (1.0 - sel) * pr_std
            if return_mean:
                style_z[m] = (jnp.broadcast_to(mu_m, (N, *mu_m.shape))
                              if N > 1 else mu_m)
            else:
                style_z[m] = dist_rsample(mod_rngs[i], self.dist_name, mu_m,
                                          std_m, K=1 if N == 1 else N)
            if flatten:
                style_z[m] = style_z[m].reshape(
                    -1, self.modalities_specific_dim
                )
        return {"z": z, "modalities_z": style_z}

    def generate_from_prior(self, n_samples: int, rng=None, **kwargs):
        """Sample cluster -> shared z + private codes from priors.

        Reference ``generate_from_prior`` (``cmvae_model.py:507-544``).
        """
        if rng is None:
            rng = self.next_rng()
        params = self._ensure_params()
        rng, c_rng, z_rng = jax.random.split(rng, 3)
        clusters = jax.random.categorical(
            c_rng, params["model"]["pc_params"], shape=(n_samples,)
        )
        means = params["model"]["mean_clusters"][clusters]
        stds = self._cluster_stds(params)[clusters]
        z_shared = dist_rsample(z_rng, self.dist_name, means, stds)

        style_z = {}
        mod_rngs = jax.random.split(rng, len(self.encoders))
        for i, m in enumerate(self.encoders):
            if self.reconstruction_option == "single_prior":
                mu_m, std_m = self._modality_prior(params, m)
            elif self.reconstruction_option == "joint_prior":
                mu_m, std_m = self._w_prior()
            else:
                raise NotImplementedError()
            mu_m = jnp.broadcast_to(mu_m, (n_samples, mu_m.shape[-1]))
            std_m = jnp.broadcast_to(std_m, (n_samples, std_m.shape[-1]))
            style_z[m] = dist_rsample(mod_rngs[i], self.dist_name, mu_m, std_m)
        return ModelOutput(z=z_shared, one_latent_space=False,
                           modalities_z=style_z)

    # --------------------------------------------------------------- clusters
    def predict_clusters(self, inputs, rng=None, compute_lliks: bool = False,
                         **kwargs) -> ModelOutput:
        """Cluster assignment by per-modality majority vote.

        Reference ``predict_clusters`` (``cmvae_model.py:546-619``).
        """
        batch = as_batch(inputs)
        params = self._ensure_params()
        if rng is None:
            rng = self.next_rng()

        pc = np.asarray(self.pc_params_probs(params))
        lpc = np.log(pc + 1e-20)
        cluster_means = params["model"]["mean_clusters"]
        cluster_stds = self._cluster_stds(params)

        mods = list(batch.data.keys())
        assigns = []
        pc_zs = {}
        norm_lliks = []
        rngs = jax.random.split(rng, len(mods))
        for i, mod in enumerate(mods):
            o = self.encode_mod(params, mod, batch.data[mod])
            mu = o["embedding"]
            sigma = log_var_to_std(o["log_covariance"], self.dist_name)
            z = dist_rsample(rngs[i], self.dist_name, mu, sigma)

            lpz_c = dist_log_prob(
                self.dist_name, z[None], cluster_means[:, None, :],
                cluster_stds[:, None, :],
            ).sum(-1)  # (C, B)
            pc_z = jax.nn.softmax(jnp.asarray(lpc)[:, None] + lpz_c, axis=0)
            assigns.append(np.asarray(jnp.argmax(pc_z, axis=0)))
            pc_zs[mod] = pc_z

            if compute_lliks:
                norm_lliks.append(np.asarray(
                    ((lpz_c + jnp.asarray(lpc)[:, None]
                      - jnp.log(pc_z + 1e-20)) * pc_z).sum(0)
                    / self.latent_dim
                ))

        # majority vote (mode) across modalities
        stacked = np.stack(assigns, axis=-1)  # (B, M)
        vote = np.array([
            np.bincount(row, minlength=self.model_config.number_of_clusters
                        ).argmax()
            for row in stacked
        ])
        out = ModelOutput(clusters=jnp.asarray(vote), pc_zs=pc_zs)
        if compute_lliks:
            out["norm_lliks"] = jnp.asarray(np.stack(norm_lliks, 0).mean(0))
        return out

    def prune_clusters(self, train_data, batch_size: int = 128, rng=None):
        """Entropy-based cluster pruning (host-side loop over jitted evals).

        Reference ``prune_clusters`` (``cmvae_model.py:621-706``). Mutates
        ``params['model']['pc_params']`` with -inf for pruned clusters and
        updates ``self.n_clusters``; returns the list of entropy values.
        """
        from ...data.loader import DataLoader

        params = self._ensure_params()
        max_clusters = self.model_config.number_of_clusters
        h_values = [np.inf] * (max_clusters + 1)
        n_cluster_params = [None] * (max_clusters + 1)
        if rng is None:
            rng = self.next_rng()

        while self.n_clusters >= 2:
            logger.info("Computing entropy value with %d clusters",
                        self.n_clusters)
            loader = DataLoader(train_data, batch_size=batch_size,
                                shuffle=False, drop_last=False)
            mass = np.zeros(max_clusters)
            h_data = []
            for batch in loader:
                rng, sub = jax.random.split(rng)
                pred = self.predict_clusters(batch, rng=sub,
                                             compute_lliks=True)
                valid = np.asarray(batch.weights) > 0
                clusters = np.asarray(pred.clusters)[valid]
                for c in range(max_clusters):
                    mass[c] += (clusters == c).sum()

                h_pzc = []
                for mod, pc_z in pred.pc_zs.items():
                    p = np.asarray(pc_z)[:, valid]  # (C, B)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        ent = -(p * np.log(p, where=p > 0,
                                           out=np.zeros_like(p))).sum(0)
                        denom = np.log(np.count_nonzero(p > 1e-12, axis=0))
                        h = ent / denom
                    h_pzc.append(h)
                h_pzc = np.stack(h_pzc, 0).mean(0)
                h_data.append(self.model_config.beta * h_pzc
                              - np.asarray(pred.norm_lliks)[valid])

            h_mean = float(np.concatenate(h_data, -1).mean(-1))
            logger.info("Entropy value: %s", h_mean)
            h_values[self.n_clusters] = h_mean
            n_cluster_params[self.n_clusters] = np.asarray(
                params["model"]["pc_params"]
            ).copy()

            # eliminate the cluster with the least mass
            self.n_clusters -= 1
            pc = np.asarray(params["model"]["pc_params"]).copy()
            mass[np.isinf(pc)] = np.inf
            cluster_to_eliminate = int(np.argmin(mass))
            pc[cluster_to_eliminate] = -np.inf
            params["model"]["pc_params"] = jnp.asarray(pc)
            self.params = params
            self._jit_cache.clear()  # params structure unchanged, values ok
            logger.info("Adapted pc_params to %s", pc)

        best = int(np.argmin(np.asarray(h_values)))
        self.n_clusters = best
        params["model"]["pc_params"] = jnp.asarray(n_cluster_params[best])
        self.params = params
        logger.info(
            "The optimal number of clusters is %d", self.n_clusters
        )
        return h_values
