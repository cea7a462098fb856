"""DMVAE: private-shared disentangled multimodal VAE, TPU-native.

Behavior parity with reference ``src/multivae/models/dmvae/dmvae_model.py``:
PoE (with prior expert) for the shared code, ELBOs from the joint PoE *and*
from each unimodal shared posterior (cross ELBOs), per-modality private
betas. One deliberate deviation: the reference's ``compute_joint_nll``
accumulates ln-prior/ln-posterior terms across datapoints and chunks without
resetting (``dmvae_model.py:349-407``) — a bug; this implementation resets
them per chunk (the mathematically correct IWAE estimator).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch, as_batch
from ...nn.default_architectures import (
    BaseDictDecodersMultiLatents,
    BaseDictEncoders_MultiLatents,
)
from ...ops.gaussian import (
    gaussian_log_prob,
    kl_divergence,
    rsample_from_gaussian,
    stable_poe,
)
from ...ops.iwae import iwae_log_marginal
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import BaseMultiVAE, sum_except_batch
from ..base.step import StepInfo
from .dmvae_config import DMVAEConfig


class DMVAE(BaseMultiVAE):
    """DMVAE model with shared + per-modality private latent spaces."""

    model_name = "DMVAE"
    supports_per_sample_conditioning = True
    masked_encode_per_sample_flag = True

    def __init__(self, model_config: DMVAEConfig, encoders: dict = None,
                 decoders: dict = None, seed: int = 0):
        super().__init__(model_config, encoders, decoders, seed=seed)
        self.beta = model_config.beta
        self.multiple_latent_spaces = True
        self._set_modalities_specific_dim(model_config)
        self._set_private_betas(model_config.modalities_specific_betas)
        self.init_params()

    def _set_modalities_specific_dim(self, model_config):
        if model_config.modalities_specific_dim is None:
            self.style_dims = {m: 1 for m in self.encoders}
        else:
            if model_config.modalities_specific_dim.keys() != self.encoders.keys():
                raise AttributeError(
                    "The keys in modalities_specific_dim don't match the keys "
                    "in the encoders or input_dims"
                )
            self.style_dims = dict(model_config.modalities_specific_dim)

    def _set_private_betas(self, beta_dict):
        if beta_dict is None:
            self.private_betas = {m: 1.0 for m in self.encoders}
        else:
            if beta_dict.keys() != self.encoders.keys():
                raise AttributeError(
                    "The modality_specific_betas doesn't have the same keys "
                    "(modalities) as the provided encoders dict."
                )
            self.private_betas = dict(beta_dict)

    def default_encoders(self, model_config) -> dict:
        return BaseDictEncoders_MultiLatents(
            input_dims=model_config.input_dims,
            latent_dim=model_config.latent_dim,
            modality_dims=model_config.modalities_specific_dim,
        )

    def default_decoders(self, model_config) -> dict:
        return BaseDictDecodersMultiLatents(
            input_dims=model_config.input_dims,
            latent_dim=model_config.latent_dim,
            modality_dims=model_config.modalities_specific_dim,
        )

    def _decoder_input_dim(self, mod: str) -> int:
        dims = self.model_config.modalities_specific_dim or {
            m: 1 for m in self.encoders
        }
        return self.latent_dim + dims[mod]

    # ------------------------------------------------------------ inference
    def _infer_latent_parameters(self, params, batch: MultimodalBatch,
                                 subset=None):
        """Shared PoE (prior expert, mask-zeroed precisions) + private params.

        Reference ``_infer_latent_parameters`` (``dmvae_model.py:94-141``).
        """
        subset = list(self.encoders.keys()) if subset is None else list(subset)
        private_params = {}
        shared_mus, shared_lvs, masks = [], [], []
        shared_params = {}
        for m in subset:
            out = self.encode_mod(params, m, batch.data[m])
            private_params[m] = (out["style_embedding"],
                                 out["style_log_covariance"])
            shared_params[m] = (out["embedding"], out["log_covariance"])
            shared_mus.append(out["embedding"])
            shared_lvs.append(out["log_covariance"])
            masks.append(batch.masks[m])

        mus = jnp.stack(shared_mus + [jnp.zeros_like(shared_mus[0])])
        lvs = jnp.stack(shared_lvs + [jnp.zeros_like(shared_lvs[0])])
        mask = jnp.stack(masks + [jnp.ones_like(masks[0])])
        joint_mu, joint_lv = stable_poe(mus, lvs, mask)
        return joint_mu, joint_lv, shared_params, private_params

    def _compute_elbo(self, params, batch, q_mu, q_lv, private_params, rng):
        """Negative ELBO per sample (reference ``_compute_elbo :183-229``)."""
        rngs = jax.random.split(rng, len(self.encoders) + 1)
        shared_z = rsample_from_gaussian(rngs[0], q_mu, q_lv)

        recon_loss = 0.0
        for i, m in enumerate(self.encoders):
            mu_p, lv_p = private_params[m]
            z_mod = rsample_from_gaussian(rngs[i + 1], mu_p, lv_p)
            z = jnp.concatenate([shared_z, z_mod], axis=-1)
            recon = self.decode_mod(params, m, z)
            rec_m = sum_except_batch(
                self.recon_log_probs[m](recon, batch.data[m])
                * self.rescale_factors[m]
            )
            recon_loss = recon_loss + rec_m * batch.masks[m]

        kl = kl_divergence(q_mu, q_lv, jnp.zeros_like(q_mu),
                           jnp.zeros_like(q_lv)) * self.beta
        for m in self.encoders:
            mu_p, lv_p = private_params[m]
            kl_m = kl_divergence(mu_p, lv_p, jnp.zeros_like(mu_p),
                                 jnp.zeros_like(lv_p))
            kl = kl + kl_m * batch.masks[m] * self.private_betas[m]

        return -recon_loss + kl  # (B,)

    # ----------------------------------------------------------------- loss
    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo) -> ModelOutput:
        """Reference ``forward`` (``dmvae_model.py:143-181``)."""
        joint_mu, joint_lv, shared_params, private_params = (
            self._infer_latent_parameters(params, batch)
        )
        w = batch.weights
        n_data = jnp.maximum(w.sum(), 1.0)
        rngs = jax.random.split(rng, len(self.encoders) + 1)

        # all M+1 ELBOs (joint PoE + each unimodal shared posterior) in
        # ONE stacked pass: the reference loops ``_compute_elbo`` per
        # posterior (``dmvae_model.py:143-181``), re-running every decoder
        # at batch size; vmapping over the posterior axis batches each
        # decoder to (M+1)*B rows — per-row values are unchanged (each
        # row keeps the key it had in the sequential order).
        mods = list(self.encoders)
        q_mus = jnp.stack([joint_mu] + [shared_params[m][0] for m in mods])
        q_lvs = jnp.stack([joint_lv] + [shared_params[m][1] for m in mods])
        elbos = jax.vmap(
            lambda mu, lv, r: self._compute_elbo(
                params, batch, mu, lv, private_params, r)
        )(q_mus, q_lvs, rngs)  # (M+1, B)

        joint_elbo = elbos[0]
        loss = joint_elbo
        metrics = {"joint": (joint_elbo * w).sum() / n_data}

        for i, m in enumerate(mods):
            mod_elbo = elbos[i + 1] * batch.masks[m]
            loss = loss + mod_elbo
            metrics[m] = (mod_elbo * w).sum() / n_data

        loss_sum = (loss * w).sum()
        return ModelOutput(loss=loss_sum / n_data, loss_sum=loss_sum,
                           metrics=metrics)

    # --------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool) -> dict:
        """Reference ``encode`` (``dmvae_model.py:231-281``): private codes
        from posteriors for conditioning modalities, from the prior else."""
        joint_mu, joint_lv, _, private_params = self._infer_latent_parameters(
            params, batch, subset=cond_mod
        )
        rng, z_rng = jax.random.split(rng)
        z = rsample_from_gaussian(z_rng, joint_mu, joint_lv, N=N,
                                  return_mean=return_mean, flatten=flatten)
        modalities_z = {}
        mod_rngs = jax.random.split(rng, len(self.encoders))
        for i, m in enumerate(self.encoders):
            if m in cond_mod:
                mu_p, lv_p = private_params[m]
            else:
                B = joint_mu.shape[0]
                mu_p = jnp.zeros((B, self.style_dims[m]))
                lv_p = jnp.zeros((B, self.style_dims[m]))
            modalities_z[m] = rsample_from_gaussian(
                mod_rngs[i], mu_p, lv_p, N=N, return_mean=return_mean,
                flatten=flatten,
            )
        return {"z": z, "modalities_z": modalities_z}

    def _encode_masked(self, params, batch: MultimodalBatch, rng, subset, *,
                       N: int, return_mean: bool, flatten: bool,
                       per_sample: bool = False) -> dict:
        """Subset as a traced (M,) indicator: shared PoE with
        indicator-zeroed precisions; private codes multiply by the
        indicator (the non-conditioning prior is N(0, I), so
        ``sel * posterior_params`` IS the posterior-or-prior select). One
        compiled program serves every conditioning subset (see
        ``BaseMultiVAE._encode_masked``).

        ``per_sample=False`` (the public-encode default) keeps reference
        parity: private codes of conditioning modalities come from the
        posterior on every row, masked or not (reference
        ``dmvae_model.py:269-277`` under ``ignore_incomplete``).
        ``per_sample=True`` (``serving.AnySubsetPredictor``) additionally
        multiplies by the row mask, i.e. treats each row's available
        modalities as ITS conditioning set — rows missing a modality fall
        back to its N(0, I) prior."""
        enc = {m: self.encode_mod(params, m, batch.data[m])
               for m in self.encoders}
        mus = jnp.stack([enc[m]["embedding"] for m in self.encoders])
        lvs = jnp.stack([enc[m]["log_covariance"] for m in self.encoders])
        mask = jnp.stack([batch.masks[m] for m in self.encoders])
        mask = mask * subset[:, None]
        # prior expert joins the product (reference dmvae_model.py:94-141)
        mus = jnp.concatenate([mus, jnp.zeros_like(mus[:1])])
        lvs = jnp.concatenate([lvs, jnp.zeros_like(lvs[:1])])
        mask = jnp.concatenate([mask, jnp.ones_like(mask[:1])])
        joint_mu, joint_lv = stable_poe(mus, lvs, mask)

        rng, z_rng = jax.random.split(rng)
        z = rsample_from_gaussian(z_rng, joint_mu, joint_lv, N=N,
                                  return_mean=return_mean, flatten=flatten)
        modalities_z = {}
        mod_rngs = jax.random.split(rng, len(self.encoders))
        for i, m in enumerate(self.encoders):
            if per_sample:
                sel = (subset[i] * batch.masks[m])[:, None]
            else:
                sel = subset[i]
            mu_p = sel * enc[m]["style_embedding"]
            lv_p = sel * enc[m]["style_log_covariance"]
            modalities_z[m] = rsample_from_gaussian(
                mod_rngs[i], mu_p, lv_p, N=N, return_mean=return_mean,
                flatten=flatten,
            )
        return {"z": z, "modalities_z": modalities_z}

    def generate_from_prior(self, n_samples: int, rng=None, **kwargs):
        """Prior samples for shared + private spaces
        (reference ``dmvae_model.py:283-309``)."""
        if rng is None:
            rng = self.next_rng()
        rngs = jax.random.split(rng, len(self.style_dims) + 1)
        shape = (n_samples, self.latent_dim) if n_samples > 1 else (
            self.latent_dim,)
        z = jax.random.normal(rngs[0], shape)
        modalities_z = {}
        for i, (m, dim) in enumerate(self.style_dims.items()):
            s = (n_samples, dim) if n_samples > 1 else (dim,)
            modalities_z[m] = jax.random.normal(rngs[i + 1], s)
        return ModelOutput(z=z, one_latent_space=False,
                           modalities_z=modalities_z)

    # ------------------------------------------------------------ joint NLL
    def compute_joint_nll(self, inputs, K: int = 1000,
                          batch_size_K: int = 100, rng=None):
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
        joint_mu, joint_lv, _, private_params = self._infer_latent_parameters(
            params, batch
        )

        def logw_chunk(rng, chunk: int):
            rng, z_rng = jax.random.split(rng)
            z = rsample_from_gaussian(z_rng, joint_mu, joint_lv, N=chunk)
            lpx_z = 0.0
            lpz = jnp.sum(
                gaussian_log_prob(z, jnp.zeros_like(z), jnp.zeros_like(z)),
                axis=-1,
            )
            lqz = jnp.sum(
                gaussian_log_prob(z, joint_mu[None], joint_lv[None]), axis=-1, dtype=jnp.float32
            )
            mod_rngs = jax.random.split(rng, len(self.encoders))
            for i, m in enumerate(self.decoders):
                mu_p, lv_p = private_params[m]
                z_p = rsample_from_gaussian(mod_rngs[i], mu_p, lv_p, N=chunk)
                full = jnp.concatenate([z, z_p], axis=-1)
                recon = self.decode_mod(params, m, full)
                lpx_z = lpx_z + sum_except_batch(
                    self.recon_log_probs[m](recon, batch.data[m][None]),
                    batch_ndims=2,
                )
                lpz = lpz + jnp.sum(
                    gaussian_log_prob(z_p, jnp.zeros_like(z_p),
                                      jnp.zeros_like(z_p)), axis=-1, dtype=jnp.float32,
                )
                lqz = lqz + jnp.sum(
                    gaussian_log_prob(z_p, mu_p[None], lv_p[None]), axis=-1, dtype=jnp.float32
                )
            return lpx_z + lpz - lqz

        ln_px = iwae_log_marginal(logw_chunk, rng, K, batch_size_K)
        # weights are 1 for real rows and 0 for loader padding rows, so the
        # evaluator can keep one compiled shape across partial final batches.
        return -jnp.sum(ln_px * batch.weights)
