"""MMVAE+: MoE shared latents + per-modality private latents, TPU-native.

Behavior parity with reference
``src/multivae/models/mmvaePlus/mmvaePlus_model.py``: per-modality
posteriors over a shared code u and a private code w; cross-modal
reconstructions draw the private code from the modality prior r_m
(``:125-199``); K-sample dreg_looser / iwae_looser objectives with beta
scaling the KL block (``:230-363``). DReG hooks are realized with
``ops.dreg.scale_grad`` on both u and w samples.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch, as_batch
from ...nn.default_architectures import (
    BaseDictDecodersMultiLatents,
    BaseDictEncoders_MultiLatents,
)
from ...ops.dreg import scale_grad
from ...ops.kdist import (
    check_dist_name,
    dist_log_prob,
    dist_rsample,
    dist_rsample_k,
    log_var_to_std,
    mixture_logsumexp,
)
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import BaseMultiVAE
from ..base.step import StepInfo
from .mmvaePlus_config import MMVAEPlusConfig

class MMVAEPlus(BaseMultiVAE):
    """The MMVAE+ model."""

    model_name = "MMVAEPlus"
    # Batch-sum objective (loss == loss_sum): chunked gradient
    # accumulation is exact -> eligible for trainer microbatch_steps.
    loss_is_sum = True

    def __init__(self, model_config: MMVAEPlusConfig, encoders: dict = None,
                 decoders: dict = None, seed: int = 0):
        if model_config.modalities_specific_dim is None:
            raise AttributeError(
                "The modalities_specific_dim attribute must be provided in "
                "the model config."
            )
        check_dist_name(model_config.prior_and_posterior_dist)
        super().__init__(model_config, encoders, decoders, seed=seed)
        self.dist_name = model_config.prior_and_posterior_dist
        self.K = model_config.K
        self.beta = model_config.beta
        self.objective = model_config.loss
        self.modalities_specific_dim = model_config.modalities_specific_dim
        self.reconstruction_option = model_config.reconstruction_option
        self.multiple_latent_spaces = True
        self.style_dims = {m: self.modalities_specific_dim
                           for m in self.encoders}
        self.init_params()

    def default_encoders(self, model_config) -> dict:
        return BaseDictEncoders_MultiLatents(
            input_dims=model_config.input_dims,
            latent_dim=model_config.latent_dim,
            modality_dims={m: model_config.modalities_specific_dim
                           for m in model_config.input_dims},
        )

    def default_decoders(self, model_config) -> dict:
        return BaseDictDecodersMultiLatents(
            input_dims=model_config.input_dims,
            latent_dim=model_config.latent_dim,
            modality_dims={m: model_config.modalities_specific_dim
                           for m in model_config.input_dims},
        )

    def _decoder_input_dim(self, mod: str) -> int:
        return self.latent_dim + self.modalities_specific_dim

    def _init_extra_params(self, rng) -> dict:
        """Modality priors r_m + shared prior p (means fixed at zero;
        log-vars learnable per config flags). Reference ``:76-111``."""
        extra = {}
        if self.model_config.learn_modality_prior:
            for m in self.encoders:
                extra[f"prior_log_var_{m}"] = jnp.zeros(
                    (1, self.modalities_specific_dim)
                )
        if self.model_config.learn_shared_prior:
            extra["prior_log_var_shared"] = jnp.zeros(
                (1, self.latent_dim + self.modalities_specific_dim)
            )
        return extra

    def _modality_prior(self, params, mod: str):
        dtype = self.param_dtype(params)
        mean = jnp.zeros((1, self.modalities_specific_dim), dtype)
        if self.model_config.learn_modality_prior:
            lv = params["model"][f"prior_log_var_{mod}"]
        else:
            lv = jnp.zeros((1, self.modalities_specific_dim), dtype)
        return mean, log_var_to_std(lv, self.dist_name)

    def pz_params(self, params):
        dtype = self.param_dtype(params)
        full = self.latent_dim + self.modalities_specific_dim
        mean = jnp.zeros((1, full), dtype)
        if self.model_config.learn_shared_prior:
            lv = params["model"]["prior_log_var_shared"]
        else:
            lv = jnp.zeros((1, full), dtype)
        return mean, log_var_to_std(lv, self.dist_name)

    # ------------------------------------------------------------ internals
    def _posteriors(self, params, batch: MultimodalBatch, mods=None):
        mods = list(self.encoders.keys()) if mods is None else list(mods)
        out = {}
        for m in mods:
            o = self.encode_mod(params, m, batch.data[m])
            out[m] = {
                "u": (o["embedding"],
                      log_var_to_std(o["log_covariance"], self.dist_name)),
                "w": (o["style_embedding"],
                      log_var_to_std(o["style_log_covariance"],
                                     self.dist_name)),
            }
        return out

    def _sample_embeddings(self, params, posteriors, rng, K):
        zs = {}
        rngs = jax.random.split(rng, 2 * len(posteriors))
        for i, m in enumerate(posteriors):
            u = dist_rsample_k(rngs[2 * i], self.dist_name,
                               *posteriors[m]["u"], K)
            w = dist_rsample_k(rngs[2 * i + 1], self.dist_name,
                               *posteriors[m]["w"], K)
            zs[m] = {"u": u, "w": w}
        return zs

    def _stacked_posteriors(self, posteriors, detach: bool):
        mods = list(posteriors.keys())
        u_mu = jnp.stack([posteriors[m]["u"][0] for m in mods])
        u_sig = jnp.stack([posteriors[m]["u"][1] for m in mods])
        w_mu = jnp.stack([posteriors[m]["w"][0] for m in mods])
        w_sig = jnp.stack([posteriors[m]["w"][1] for m in mods])
        if detach:
            u_mu, u_sig, w_mu, w_sig = map(jax.lax.stop_gradient,
                                           (u_mu, u_sig, w_mu, w_sig))
        return u_mu, u_sig, w_mu, w_sig

    def _reconstructions(self, params, batch, posteriors, zs, rng, K):
        """All M x M reconstructions with ONE decoder call per recon
        modality over the stacked (M_cond, K, B) latents.

        Reference ``:163-193`` loops over (cond, recon) pairs; here the
        cross-modal private codes are drawn from the modality prior r_m as
        one (M, K, B, S) draw per recon modality, with the self row
        replaced by the posterior sample. Returns (recons, cross_w) where
        cross_w holds the prior draws reused by the DReG second pass.
        """
        mods = list(posteriors.keys())
        U = jnp.stack([zs[m]["u"] for m in mods])  # (M, K, B, D)
        B = U.shape[2]
        recons = {}
        cross_w = {}
        rngs = jax.random.split(rng, len(mods))
        for j, recon_mod in enumerate(mods):
            p_mu, p_std = self._modality_prior(params, recon_mod)
            w_prior = dist_rsample_k(
                rngs[j], self.dist_name,
                jnp.broadcast_to(p_mu, (len(mods), B, p_mu.shape[-1])),
                jnp.broadcast_to(p_std, (len(mods), B, p_std.shape[-1])),
                K,
            )  # (K, M, B, S)
            w_prior = jnp.moveaxis(w_prior, 0, 1)  # (M, K, B, S)
            cross_w[recon_mod] = w_prior
            W = w_prior.at[j].set(zs[recon_mod]["w"])
            Z = jnp.concatenate([U, W], axis=-1)
            recons[recon_mod] = self.decode_mod(params, recon_mod, Z)
        return recons, cross_w

    def _decode_with_latents(self, params, zs, cross_w):
        """Re-decode from given latents + stored prior draws (DReG pass 2)."""
        mods = list(zs.keys())
        U = jnp.stack([zs[m]["u"] for m in mods])
        out = {}
        for j, recon_mod in enumerate(mods):
            W = cross_w[recon_mod].at[j].set(zs[recon_mod]["w"])
            Z = jnp.concatenate([U, W], axis=-1)
            out[recon_mod] = self.decode_mod(params, recon_mod, Z)
        return out

    def _compute_k_lws(self, params, batch, posteriors, zs, recons,
                       detach_posteriors: bool, beta: float = None,
                       unit_rescale: bool = False):
        """Vectorized ``_compute_k_lws`` (reference
        ``mmvaePlus_model.py:230-303``): every per-modality term is one
        broadcasted op over the stacked (M, K, B) layout."""
        beta = self.beta if beta is None else beta
        mods = list(posteriors.keys())
        mask = jnp.stack([batch.masks[m] for m in mods])  # (M, B)
        n_mods_sample = jnp.maximum(mask.sum(0), 1.0)
        pz_mu, pz_std = self.pz_params(params)

        U = jnp.stack([zs[m]["u"] for m in mods])  # (M, K, B, D)
        W = jnp.stack([zs[m]["w"] for m in mods])  # (M, K, B, S)
        Z = jnp.concatenate([U, W], axis=-1)

        lpz = dist_log_prob(self.dist_name, Z, pz_mu,
                            pz_std).sum(-1, dtype=jnp.float32)

        u_mu, u_sig, w_mu, w_sig = self._stacked_posteriors(
            posteriors, detach_posteriors
        )
        # mixture over experts for the shared code: (Mz, K, B)
        lqu_x = mixture_logsumexp(U, u_mu, u_sig, mask, self.dist_name) - (
            jnp.log(n_mods_sample)
        )

        # private posterior density, own modality only: (M, K, B)
        lqw_x = dist_log_prob(
            self.dist_name, W, w_mu[:, None], w_sig[:, None]
        ).sum(-1, dtype=jnp.float32)

        lpx_z = 0.0
        for j, recon_mod in enumerate(mods):
            lp = self.recon_log_probs[recon_mod](
                recons[recon_mod], batch.data[recon_mod][None, None]
            )
            factor = 1.0 if unit_rescale else self.rescale_factors[recon_mod]
            lp = lp.reshape(*lp.shape[:3], -1).sum(-1,
                                                    dtype=jnp.float32) * factor
            lp = lp * batch.masks[recon_mod][None, None, :]
            lpx_z = lpx_z + lp

        lw = lpx_z + beta * (lpz - lqu_x - lqw_x)
        lw = lw * mask[:, None, :]
        return {m: lw[i] for i, m in enumerate(mods)}, n_mods_sample

    # ----------------------------------------------------------------- loss
    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo, K: int = None) -> ModelOutput:
        K = K or self.K
        rng, s_rng, r_rng = jax.random.split(rng, 3)
        posteriors = self._posteriors(params, batch)
        zs = self._sample_embeddings(params, posteriors, s_rng, K)
        recons, cross_w = self._reconstructions(params, batch, posteriors,
                                                zs, r_rng, K)

        if self.objective == "dreg_looser":
            return self._dreg_looser(params, batch, posteriors, zs, recons,
                                     cross_w)
        if self.objective == "iwae_looser":
            return self._iwae_looser(params, batch, posteriors, zs, recons)
        raise NotImplementedError(self.objective)

    def _dreg_looser(self, params, batch, posteriors, zs, recons,
                     cross_w):
        """Reference ``_dreg_looser`` (``mmvaePlus_model.py:305-341``).

        Two evaluations of the log-weights: the first (value-only) yields
        the normalized importance weights w_k; the second consumes the
        latents wrapped in ``scale_grad`` and re-decoded with the SAME
        cross-modal prior draws, so the z-path cotangent picks up the extra
        w_k factor exactly like the reference's backward hook.
        """
        lws_val, _ = self._compute_k_lws(
            params, batch, posteriors, zs, recons, detach_posteriors=True
        )
        wk = {
            m: jax.lax.stop_gradient(
                jnp.exp(lw - jax.nn.logsumexp(lw, 0, keepdims=True))
            )
            for m, lw in lws_val.items()
        }
        zs_hooked = {
            m: {"u": scale_grad(zs[m]["u"], wk[m][..., None]),
                "w": scale_grad(zs[m]["w"], wk[m][..., None])}
            for m in zs
        }
        recons_hooked = self._decode_with_latents(params, zs_hooked, cross_w)
        lws, n_mods_sample = self._compute_k_lws(
            params, batch, posteriors, zs_hooked, recons_hooked,
            detach_posteriors=True,
        )
        total = jnp.stack([lws[m] * wk[m] for m in lws]).sum(1)
        total = total.sum(0) / n_mods_sample
        loss = -(total * batch.weights).sum()
        return ModelOutput(loss=loss, loss_sum=loss, metrics={})

    def _iwae_looser(self, params, batch, posteriors, zs, recons):
        """Reference ``_iwae_looser`` (``mmvaePlus_model.py:343-363``)."""
        lws, n_mods_sample = self._compute_k_lws(
            params, batch, posteriors, zs, recons, detach_posteriors=False
        )
        stacked = jnp.stack(list(lws.values()))
        k_est = jax.nn.logsumexp(stacked, axis=1) - math.log(stacked.shape[1])
        per_sample = k_est.sum(0) / n_mods_sample
        loss = -(per_sample * batch.weights).sum()
        return ModelOutput(loss=loss, loss_sum=loss, metrics={})

    # --------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool) -> dict:
        """Reference ``encode`` (``mmvaePlus_model.py:365-452``)."""
        posteriors = self._posteriors(params, batch, mods=cond_mod)
        B = batch.n_samples
        mus = jnp.stack([posteriors[m]["u"][0] for m in cond_mod])
        sigmas = jnp.stack([posteriors[m]["u"][1] for m in cond_mod])

        rng, choice_rng, sample_rng = jax.random.split(rng, 3)
        if return_mean:
            emb = mus.mean(0)
            z = jnp.broadcast_to(emb, (N, *emb.shape)) if N > 1 else emb
        else:
            idx = jax.random.randint(choice_rng, (), 0, len(cond_mod))
            z = dist_rsample(sample_rng, self.dist_name, mus[idx],
                             sigmas[idx], K=1 if N == 1 else N)
        if flatten:
            z = z.reshape(-1, self.latent_dim)

        style_z = {}
        mod_rngs = jax.random.split(rng, len(self.encoders))
        for i, m in enumerate(self.encoders):
            if m not in cond_mod:
                if self.reconstruction_option == "single_prior":
                    mu_m, std_m = self._modality_prior(params, m)
                else:  # joint_prior
                    pz_mu, pz_std = self.pz_params(params)
                    mu_m = pz_mu[:, self.latent_dim:]
                    std_m = pz_std[:, self.latent_dim:]
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

    def _modality_style_prior(self, params, m):
        """(mu, std) of modality m's private prior under the configured
        ``reconstruction_option`` (reference ``mmvaePlus_model.py:365-452``)."""
        if self.reconstruction_option == "single_prior":
            return self._modality_prior(params, m)
        pz_mu, pz_std = self.pz_params(params)
        return (pz_mu[:, self.latent_dim:], pz_std[:, self.latent_dim:])

    def _encode_masked(self, params, batch: MultimodalBatch, rng, subset, *,
                       N: int, return_mean: bool, flatten: bool) -> dict:
        """Subset as a traced (M,) indicator (see ``MMVAE._encode_masked``):
        random expert by ``categorical(log(subset))``; private codes select
        posterior-vs-prior parameters by the indicator."""
        posteriors = self._posteriors(params, batch)
        B = batch.n_samples
        mods = list(self.encoders)
        mus = jnp.stack([posteriors[m]["u"][0] for m in mods])
        sigmas = jnp.stack([posteriors[m]["u"][1] for m in mods])

        rng, choice_rng, sample_rng = jax.random.split(rng, 3)
        if return_mean:
            emb = jnp.einsum("m,mbd->bd", subset, mus) / subset.sum()
            z = jnp.broadcast_to(emb, (N, *emb.shape)) if N > 1 else emb
        else:
            idx = jax.random.categorical(choice_rng, jnp.log(subset))
            z = dist_rsample(sample_rng, self.dist_name, mus[idx],
                             sigmas[idx], K=1 if N == 1 else N)
        if flatten:
            z = z.reshape(-1, self.latent_dim)

        style_z = {}
        mod_rngs = jax.random.split(rng, len(self.encoders))
        for i, m in enumerate(self.encoders):
            pr_mu, pr_std = self._modality_style_prior(params, m)
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
        if rng is None:
            rng = self.next_rng()
        params = self._ensure_params()
        mean, std = self.pz_params(params)
        z = dist_rsample(rng, self.dist_name, mean, std,
                         K=n_samples if n_samples > 1 else 1)
        z = z.reshape(-1, z.shape[-1]) if n_samples > 1 else z[0]
        return ModelOutput(z=z, one_latent_space=True)

    def decode(self, embedding: ModelOutput, modalities="all"):
        """Handle prior samples that carry the full (u, w) code
        (generate_from_prior returns one_latent_space=True with the
        concatenated latent)."""
        one_latent = embedding.get("one_latent_space", True)
        if one_latent and embedding["z"].shape[-1] == (
            self.latent_dim + self.modalities_specific_dim
        ):
            params = self._ensure_params()
            mods = (tuple(self.decoders.keys()) if modalities == "all"
                    else (modalities,) if isinstance(modalities, str)
                    else tuple(modalities))
            fn = self._jit(("decode_full", mods),
                           partial(self._decode_mods, mods=mods))
            outputs = fn(params, embedding["z"], modalities_z=None)
            return ModelOutput(**outputs)
        return super().decode(embedding, modalities)

    # ------------------------------------------------------------ joint NLL
    def compute_joint_nll(self, inputs, K: int = 1000,
                          batch_size_K: int = 100, rng=None):
        """Reference ``compute_joint_nll`` (``mmvaePlus_model.py:478-532``):
        K//M samples per modality expert, lws aggregated across experts and
        samples; rescale factors and beta forced to 1."""
        batch = as_batch(inputs)
        self._check_complete_for_nll(inputs)
        params = self._ensure_params()
        if rng is None:
            rng = self.next_rng()
        fn = self._jit(
            ("joint_nll", K, batch_size_K),
            partial(self._joint_nll, K=K, batch_size_K=batch_size_K),
        )
        return fn(params, batch, rng)

    def _joint_nll(self, params, batch, rng, *, K, batch_size_K):
        from ...ops.iwae import chunked_logsumexp

        k_iwae = max(K // self.n_modalities, 1)
        chunk = max(min(batch_size_K, k_iwae), 1)

        posteriors = self._posteriors(params, batch)

        def chunk_lse(sub, n):
            s_rng, r_rng = jax.random.split(sub)
            zs = self._sample_embeddings(params, posteriors, s_rng, n)
            recons, _ = self._reconstructions(params, batch, posteriors, zs,
                                              r_rng, n)
            lws, _ = self._compute_k_lws(
                params, batch, posteriors, zs, recons,
                detach_posteriors=False, beta=1.0, unit_rescale=True,
            )
            stacked = jnp.concatenate(list(lws.values()), axis=0)  # (M*n, B)
            return jax.nn.logsumexp(stacked, axis=0)

        lse = chunked_logsumexp(chunk_lse, rng, k_iwae, chunk)
        ll = lse - math.log(k_iwae * self.n_modalities)
        # weights zero out loader padding rows (one compiled shape for the
        # evaluator's final partial batch).
        return -(ll * batch.weights).sum()
