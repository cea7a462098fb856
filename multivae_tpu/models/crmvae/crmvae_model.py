"""CRMVAE: coordination-regularized multimodal VAE, TPU-native.

Behavior parity with reference ``src/multivae/models/crmvae/crmvae_model.py``:
loss = (1/(2(M+1))) * sum over decoders of [E_q(z|X) log p(x_i|z) +
E_q(z|x_i) log p(x_i|z)] + beta/(M+1) * [KL(q(z|X)||p(z)) +
sum_i KL(q(z|X)||q(z|x_i))], with masked experts excluded from the PoE via
precision masking (reference sets log_var=+inf, ``crmvae_model.py:128-140``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch, as_batch
from ...ops.gaussian import kl_divergence, masked_poe, rsample_from_gaussian
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import BaseMultiVAE, sum_except_batch
from ..base.step import StepInfo
from .crmvae_config import CRMVAEConfig


class CRMVAE(BaseMultiVAE):
    """CRMVAE model."""

    model_name = "CRMVAE"
    supports_per_sample_conditioning = True

    def __init__(self, model_config: CRMVAEConfig, encoders: dict = None,
                 decoders: dict = None, seed: int = 0):
        super().__init__(model_config, encoders, decoders, seed=seed)
        self.beta = model_config.beta
        self.init_params()

    def _joint_posterior(self, params, batch: MultimodalBatch, mods=None):
        mus, log_vars, mask = self.stacked_gaussian_params(params, batch, mods)
        joint_mu, joint_lv = masked_poe(mus, log_vars, mask)
        return joint_mu, joint_lv, (mus, log_vars, mask)

    # ----------------------------------------------------------------- loss
    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo) -> ModelOutput:
        """Reference ``forward`` (``crmvae_model.py:44-113``)."""
        joint_mu, joint_lv, (mus, lvs, mask) = self._joint_posterior(
            params, batch
        )
        mods = list(self.encoders.keys())
        M = self.n_modalities
        w = batch.weights

        rngs = jax.random.split(rng, M + 1)
        z_joint = rsample_from_gaussian(rngs[0], joint_mu, joint_lv)
        z_samples = {"joint": z_joint}

        metrics = {}
        joint_kld = kl_divergence(
            joint_mu, joint_lv, jnp.zeros_like(joint_mu),
            jnp.zeros_like(joint_lv),
        )
        metrics["joint_divergence"] = (joint_kld * w).sum() / jnp.maximum(
            w.sum(), 1.0
        )
        divergence = joint_kld  # (B,)

        # unimodal posteriors use the UNmasked encoder outputs
        for i, m in enumerate(mods):
            z_samples[m] = rsample_from_gaussian(rngs[i + 1], mus[i], lvs[i])
            kl_m = kl_divergence(joint_mu, joint_lv, mus[i], lvs[i])
            kl_m = kl_m * batch.masks[m]
            divergence = divergence + kl_m
            metrics[f"kl_{m}"] = (kl_m * w).sum() / jnp.maximum(w.sum(), 1.0)

        loss_rec = 0.0
        B = w.shape[0]
        for gen_mod in mods:
            # both reconstruction sources (joint z, own z — reference
            # ``:84-101`` decodes each separately) ride ONE decoder
            # application on 2B stacked rows.
            z_pair = jnp.concatenate(
                [z_samples["joint"], z_samples[gen_mod]], axis=0)
            recon = self.decode_mod(params, gen_mod, z_pair)
            target = jnp.concatenate(
                [batch.data[gen_mod], batch.data[gen_mod]], axis=0)
            rec_pair = sum_except_batch(
                -self.recon_log_probs[gen_mod](recon, target)
                * self.rescale_factors[gen_mod]
            ) * jnp.concatenate([batch.masks[gen_mod]] * 2)
            for m_rec, src in ((rec_pair[:B], "joint"),
                               (rec_pair[B:], gen_mod)):
                loss_rec = loss_rec + m_rec
                metrics[f"recon_{gen_mod}_from_{src}"] = (
                    (m_rec * w).sum() / jnp.maximum(w.sum(), 1.0)
                )

        loss_rec = loss_rec / (2.0 * (M + 1))
        divergence = divergence / (M + 1)
        total = (loss_rec + self.beta * divergence) * w
        total_sum = total.sum()
        # reference returns loss = loss_sum = the batch sum (``:109-112``)
        return ModelOutput(loss=total_sum, loss_sum=total_sum, metrics=metrics)

    # --------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool) -> dict:
        """Reference ``encode`` (``crmvae_model.py:181-221``)."""
        joint_mu, joint_lv, _ = self._joint_posterior(params, batch,
                                                      mods=cond_mod)
        z = rsample_from_gaussian(rng, joint_mu, joint_lv, N=N,
                                  return_mean=return_mean, flatten=flatten)
        return {"z": z}

    def _encode_masked(self, params, batch: MultimodalBatch, rng, subset, *,
                       N: int, return_mean: bool, flatten: bool) -> dict:
        """Subset as a traced (M,) indicator: one compiled program serves
        every conditioning subset (see ``BaseMultiVAE._encode_masked``)."""
        mus, log_vars, mask = self.stacked_gaussian_params(params, batch)
        mu, lv = masked_poe(mus, log_vars, mask * subset[:, None])
        z = rsample_from_gaussian(rng, mu, lv, N=N, return_mean=return_mean,
                                  flatten=flatten)
        return {"z": z}

    # ------------------------------------------------------------ joint NLL
    def compute_joint_nll(self, inputs, K: int = 1000,
                          batch_size_K: int = 100, rng=None):
        """Reference ``compute_joint_nll`` (``crmvae_model.py:223-295``)."""
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
        joint_mu, joint_lv, _ = self._joint_posterior(params, batch)
        return self._gaussian_iwae_joint_nll(
            params, batch, joint_mu, joint_lv, rng, K, batch_size_K
        )
