"""MMVAE: Mixture-of-Experts multimodal VAE with K-sample objectives.

Behavior parity with reference ``src/multivae/models/mmvae/mmvae_model.py``.
TPU-native notes:

- The K importance-sample axis is a leading array axis (K, B, D); all M x M
  cross reconstructions batch through the decoders as (K*B) matmuls.
- DReG's mutable gradient hook (reference ``:262-266``) becomes
  ``ops.dreg.scale_grad``: the importance weights are computed in a first
  (gradient-free) evaluation of the log-weights, then the loss is
  re-evaluated with the latents wrapped in scale_grad so the z-path
  cotangent picks up the extra w_k factor. XLA CSE dedupes most of the
  repeated forward work.
- Missing modalities: -inf is replaced by a large negative fill inside the
  mixture logsumexp (keeps gradients NaN-free), and the reference's
  ``drop_unused_modalities`` becomes unnecessary because masked terms carry
  exactly zero gradient (SURVEY §7.3).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch, as_batch
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
from .mmvae_config import MMVAEConfig

class MMVAE(BaseMultiVAE):
    """Variational Mixture-of-Experts Autoencoder."""

    model_name = "MMVAE"
    # Batch-sum objective (loss == loss_sum): chunked gradient
    # accumulation is exact -> eligible for trainer microbatch_steps.
    loss_is_sum = True

    def __init__(self, model_config: MMVAEConfig, encoders: dict = None,
                 decoders: dict = None, seed: int = 0):
        check_dist_name(model_config.prior_and_posterior_dist)
        if model_config.prior_and_posterior_dist not in (
            "laplace_with_softmax", "normal"
        ):
            raise AttributeError(
                "The posterior_dist parameter must be either "
                "'laplace_with_softmax' or 'normal'. "
                f"{model_config.prior_and_posterior_dist} was provided."
            )
        super().__init__(model_config, encoders, decoders, seed=seed)
        self.dist_name = model_config.prior_and_posterior_dist
        self.K = model_config.K
        self.learn_prior = model_config.learn_prior
        self.objective = model_config.loss
        self.init_params()

    def _init_extra_params(self, rng) -> dict:
        # prior mean is a fixed constant (requires_grad=False in reference);
        # the log-variance is learnable iff learn_prior.
        if self.learn_prior:
            return {"prior_log_var": jnp.zeros((1, self.latent_dim))}
        return {}

    def pz_params(self, params):
        """(mean, std) of the prior (reference ``pz_params`` ``:76-93``)."""
        dtype = self.param_dtype(params)
        mean = jnp.zeros((1, self.latent_dim), dtype)
        if self.learn_prior:
            log_var = params["model"]["prior_log_var"]
        else:
            log_var = jnp.zeros((1, self.latent_dim), dtype)
        return mean, log_var_to_std(log_var, self.dist_name)

    # ------------------------------------------------------------ internals
    def _posterior_params(self, params, batch: MultimodalBatch, mods=None):
        mods = list(self.encoders.keys()) if mods is None else list(mods)
        out = {}
        for m in mods:
            o = self.encode_mod(params, m, batch.data[m])
            out[m] = (o["embedding"],
                      log_var_to_std(o["log_covariance"], self.dist_name))
        return out

    def _sample_embeddings(self, params, batch, post_params, rng, K):
        zs = {}
        rngs = jax.random.split(rng, len(post_params))
        for i, m in enumerate(post_params):
            mu, sigma = post_params[m]
            zs[m] = dist_rsample_k(rngs[i], self.dist_name, mu, sigma, K)
        return zs

    def _compute_k_lws(self, params, batch: MultimodalBatch, post_params,
                       zs, detach_posteriors: bool):
        """Per-modality (K, B) log importance weights, fully vectorized.

        Reference ``compute_k_lws`` (``mmvae_model.py:160-236``). TPU-first
        restructure: the per-(cond, recon) Python double loop becomes ONE
        decoder call per recon modality over the stacked latents
        (M, K, B, D) and one broadcasted mixture-density evaluation —
        the compiled graph is M x smaller and the decodes run as single
        large batches on the MXU.
        """
        mods = list(post_params.keys())
        M = len(mods)
        mask = jnp.stack([batch.masks[m] for m in mods])  # (M, B)
        n_mods_sample = jnp.maximum(mask.sum(0), 1.0)     # (B,)
        prior_mu, prior_std = self.pz_params(params)

        Z = jnp.stack([zs[m] for m in mods])  # (M, K, B, D)

        # log p(z): (M, K, B)
        lpz = dist_log_prob(self.dist_name, Z, prior_mu,
                            prior_std).sum(-1, dtype=jnp.float32)

        # mixture density log q(z|X): evaluate every expert against every
        # modality's samples in one broadcasted op -> (Mq, Mz, K, B)
        mus = jnp.stack([post_params[m][0] for m in mods])      # (Mq, B, D)
        sigmas = jnp.stack([post_params[m][1] for m in mods])
        if detach_posteriors:
            mus = jax.lax.stop_gradient(mus)
            sigmas = jax.lax.stop_gradient(sigmas)
        lqz_x = mixture_logsumexp(Z, mus, sigmas, mask, self.dist_name) - (
            jnp.log(n_mods_sample)
        )

        # sum_m log p(x_m | z): ONE decode per recon modality on (M*K*B)
        lpx_z = 0.0
        for recon_mod in mods:
            recon = self.decode_mod(params, recon_mod, Z)  # (M, K, B, *)
            lp = self.recon_log_probs[recon_mod](
                recon, batch.data[recon_mod][None, None]
            )
            lp = lp.reshape(*lp.shape[:3], -1).sum(-1, dtype=jnp.float32) * (
                self.rescale_factors[recon_mod]
            )
            lp = lp * batch.masks[recon_mod][None, None, :]
            lpx_z = lpx_z + lp  # (M, K, B)

        lw = lpx_z + lpz - lqz_x
        lw = lw * mask[:, None, :]
        return {m: lw[i] for i, m in enumerate(mods)}, n_mods_sample

    # ----------------------------------------------------------------- loss
    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo, K: int = None) -> ModelOutput:
        K = K or self.K
        post_params = self._posterior_params(params, batch)
        zs = self._sample_embeddings(params, batch, post_params, rng, K)

        if self.objective == "dreg_looser":
            return self._dreg_looser(params, batch, post_params, zs)
        if self.objective == "iwae_looser":
            return self._iwae_looser(params, batch, post_params, zs)
        raise NotImplementedError(self.objective)

    def _dreg_looser(self, params, batch, post_params, zs):
        """Reference ``dreg_looser`` (``mmvae_model.py:238-272``)."""
        # pass 1 (values only): importance weights
        lws_val, _ = self._compute_k_lws(
            params, batch, post_params, zs, detach_posteriors=True
        )
        wk = {
            m: jax.lax.stop_gradient(
                jnp.exp(lw - jax.nn.logsumexp(lw, 0, keepdims=True))
            )
            for m, lw in lws_val.items()
        }
        # pass 2: gradient path with the hook (z-cotangent scaled by wk)
        zs_hooked = {m: scale_grad(zs[m], wk[m][..., None]) for m in zs}
        lws, n_mods_sample = self._compute_k_lws(
            params, batch, post_params, zs_hooked, detach_posteriors=True
        )
        total = jnp.stack([lws[m] * wk[m] for m in lws]).sum(1)  # (M, B)
        total = total.sum(0) / n_mods_sample  # (B,)
        loss = -(total * batch.weights).sum()
        return ModelOutput(loss=loss, loss_sum=loss, metrics={})

    def _iwae_looser(self, params, batch, post_params, zs):
        """Reference ``iwae_looser`` (``mmvae_model.py:274-292``)."""
        lws, n_mods_sample = self._compute_k_lws(
            params, batch, post_params, zs, detach_posteriors=False
        )
        stacked = jnp.stack(list(lws.values()))  # (M, K, B)
        k_est = jax.nn.logsumexp(stacked, axis=1) - math.log(stacked.shape[1])
        per_sample = k_est.sum(0) / n_mods_sample
        loss = -(per_sample * batch.weights).sum()
        return ModelOutput(loss=loss, loss_sum=loss, metrics={})

    def _iwae(self, params, batch, post_params, zs):
        """Reference ``iwae`` (``mmvae_model.py:294-311``): log-mean-exp over
        modalities too; returns per-sample log-likelihood (B,)."""
        lws, n_mods_sample = self._compute_k_lws(
            params, batch, post_params, zs, detach_posteriors=False
        )
        stacked = jnp.stack(list(lws.values()))  # (M, K, B)
        k_est = jax.nn.logsumexp(stacked, axis=1) - math.log(stacked.shape[1])
        return jax.nn.logsumexp(k_est, axis=0) - jnp.log(n_mods_sample)

    # --------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool) -> dict:
        """Reference ``encode`` (``mmvae_model.py:313-364``): one random
        expert of the conditioning mixture."""
        post_params = self._posterior_params(params, batch, mods=cond_mod)
        mus = jnp.stack([post_params[m][0] for m in cond_mod])
        sigmas = jnp.stack([post_params[m][1] for m in cond_mod])

        if return_mean:
            emb = mus.mean(0)
            z = jnp.broadcast_to(emb, (N, *emb.shape)) if N > 1 else emb
        else:
            rng, choice_rng, sample_rng = jax.random.split(rng, 3)
            idx = jax.random.randint(choice_rng, (), 0, len(cond_mod))
            mu, sigma = mus[idx], sigmas[idx]
            z = dist_rsample(sample_rng, self.dist_name, mu, sigma,
                             K=1 if N == 1 else N)
        if flatten:
            z = z.reshape(-1, self.latent_dim)
        return {"z": z}

    def _encode_masked(self, params, batch: MultimodalBatch, rng, subset, *,
                       N: int, return_mean: bool, flatten: bool) -> dict:
        """Subset as a traced (M,) indicator: the random mixture expert is
        drawn by ``categorical(log(subset))`` (uniform over the subset, the
        reference's ``random.choice`` semantics) so ONE compiled program
        serves every conditioning subset."""
        post_params = self._posterior_params(params, batch)
        mods = list(self.encoders)
        mus = jnp.stack([post_params[m][0] for m in mods])
        sigmas = jnp.stack([post_params[m][1] for m in mods])

        if return_mean:
            emb = jnp.einsum("m,mbd->bd", subset, mus) / subset.sum()
            z = jnp.broadcast_to(emb, (N, *emb.shape)) if N > 1 else emb
        else:
            rng, choice_rng, sample_rng = jax.random.split(rng, 3)
            idx = jax.random.categorical(choice_rng, jnp.log(subset))
            z = dist_rsample(sample_rng, self.dist_name, mus[idx],
                             sigmas[idx], K=1 if N == 1 else N)
        if flatten:
            z = z.reshape(-1, self.latent_dim)
        return {"z": z}

    def generate_from_prior(self, n_samples: int, rng=None, **kwargs):
        """Reference ``generate_from_prior`` (``mmvae_model.py:477-480``)."""
        if rng is None:
            rng = self.next_rng()
        params = self._ensure_params()
        mean, std = self.pz_params(params)
        z = dist_rsample(rng, self.dist_name, mean, std,
                         K=n_samples if n_samples > 1 else 1)
        z = z.reshape(-1, self.latent_dim) if n_samples > 1 else z[0]
        return ModelOutput(z=z, one_latent_space=True)

    # ------------------------------------------------------------ joint NLL
    def compute_joint_nll(self, inputs, K: int = 1000,
                          batch_size_K: int = 100, rng=None):
        """Reference ``compute_joint_nll`` (``mmvae_model.py:366-444``):
        sample from one random expert, weight with the mixture density."""
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
        from ...ops.iwae import iwae_log_marginal

        post_params = self._posterior_params(params, batch)
        mods = list(post_params.keys())
        rng, choice_rng = jax.random.split(rng)
        expert_idx = jax.random.randint(choice_rng, (), 0, len(mods))
        mus = jnp.stack([post_params[m][0] for m in mods])
        sigmas = jnp.stack([post_params[m][1] for m in mods])
        e_mu, e_sigma = mus[expert_idx], sigmas[expert_idx]
        prior_mu, prior_std = self.pz_params(params)

        def logw_chunk(rng, chunk: int):
            z = dist_rsample_k(rng, self.dist_name, e_mu, e_sigma, chunk)
            lpx_z = 0.0
            for m in mods:
                recon = self.decode_mod(params, m, z)
                lp = self.recon_log_probs[m](recon, batch.data[m][None])
                lpx_z = lpx_z + lp.reshape(*lp.shape[:2], -1).sum(
                    -1, dtype=jnp.float32)
            lpz = dist_log_prob(self.dist_name, z, prior_mu,
                                prior_std).sum(-1, dtype=jnp.float32)
            lqz = jax.nn.logsumexp(
                jnp.stack([
                    dist_log_prob(self.dist_name, z, mus[i],
                                  sigmas[i]).sum(-1, dtype=jnp.float32)
                    for i in range(len(mods))
                ]), axis=0,
            ) - math.log(self.n_modalities)
            return lpx_z + lpz - lqz

        ln_px = iwae_log_marginal(logw_chunk, rng, K, batch_size_K)
        # weights are 1 for real rows and 0 for loader padding rows, so the
        # evaluator can keep one compiled shape across partial final batches.
        return -jnp.sum(ln_px * batch.weights)

    def compute_joint_nll_paper(self, inputs, K: int = 1000,
                                batch_size_K: int = 10, rng=None):
        """Reference ``compute_joint_nll_paper`` (``mmvae_model.py:446-475``):
        mixture-of-experts sampling with modality rescaling; returns the
        per-batch NLL vector (matching the reference's return shape)."""
        batch = as_batch(inputs)
        params = self._ensure_params()
        if rng is None:
            rng = self.next_rng()
        fn = self._jit(
            ("joint_nll_paper", K, batch_size_K),
            partial(self._joint_nll_paper, K=K, batch_size_K=batch_size_K),
        )
        return fn(params, batch, rng)

    def _joint_nll_paper(self, params, batch, rng, *, K, batch_size_K):
        from ...ops.iwae import chunked_logsumexp

        post_params = self._posterior_params(params, batch)

        def chunk_lse(sub, n):
            zs = self._sample_embeddings(params, batch, post_params, sub, n)
            ll = self._iwae(params, batch, post_params, zs)  # (B,)
            # _iwae normalizes by n and n_mods_sample; undo to get the raw
            # chunk logsumexp so chunks of different sizes combine exactly.
            return ll + math.log(n * self.n_modalities)

        lse = chunked_logsumexp(chunk_lse, rng, K, batch_size_K)
        return -(lse - math.log(K * self.n_modalities))
