"""MVTCAE: total-correlation multimodal VAE, TPU-native.

Behavior parity with reference ``src/multivae/models/mvtcae/mvtcae_model.py``
(PoE joint posterior; loss = rec*(M-a)/M + beta*(a/M * sum_m KL(joint||q_m)
+ (1-a)*KL(joint||prior))). Missing modalities contribute zero precision to
the PoE and are mask-zeroed in the per-modality terms (the reference sets
log_var=+inf at ``mvtcae_model.py:128-130`` and index-zeroes at ``:90-93``).
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ...data.batch import MultimodalBatch, as_batch
from ...ops.gaussian import masked_poe, rsample_from_gaussian
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import BaseMultiVAE, sum_except_batch
from ..base.step import StepInfo
from .mvtcae_config import MVTCAEConfig


class MVTCAE(BaseMultiVAE):
    """MVTCAE model. See config for hyperparameters."""

    model_name = "MVTCAE"
    supports_per_sample_conditioning = True

    def __init__(self, model_config: MVTCAEConfig, encoders: dict = None,
                 decoders: dict = None, seed: int = 0):
        super().__init__(model_config, encoders, decoders, seed=seed)
        self.alpha = model_config.alpha
        self.beta = model_config.beta
        self.init_params()

    # ------------------------------------------------------------ inference
    def _joint_posterior(self, params, batch: MultimodalBatch, mods=None):
        """PoE of the (masked) unimodal posteriors.

        Returns (joint_mu, joint_log_var, per-mod (mus, log_vars, mask)).
        Reference ``_inference`` (``mvtcae_model.py:134-169``).
        """
        mus, log_vars, mask = self.stacked_gaussian_params(params, batch, mods)
        joint_mu, joint_log_var = masked_poe(mus, log_vars, mask)
        return joint_mu, joint_log_var, (mus, log_vars, mask)

    # ----------------------------------------------------------------- loss
    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo) -> ModelOutput:
        """Reference ``forward`` (``mvtcae_model.py:42-108``)."""
        joint_mu, joint_log_var, (mus, log_vars, mask) = self._joint_posterior(
            params, batch
        )
        w = batch.weights  # (B,), zero on padding samples
        n_data = jnp.maximum(w.sum(), 1.0)

        z = rsample_from_gaussian(rng, joint_mu, joint_log_var)

        # KL(joint || N(0, I)), summed over batch+dim
        joint_kld_per_sample = -0.5 * jnp.sum(
            1.0 - jnp.exp(joint_log_var) - joint_mu**2 + joint_log_var, axis=-1, dtype=jnp.float32
        )
        joint_kld = jnp.sum(joint_kld_per_sample * w)

        metrics = {"joint_divergence": joint_kld}

        # Reconstruction terms
        loss_rec = 0.0
        for i, m in enumerate(self.encoders):
            recon = self.decode_mod(params, m, z)
            m_rec = -self.recon_log_probs[m](recon, batch.data[m]) * (
                self.rescale_factors[m]
            )
            m_rec = sum_except_batch(m_rec) * batch.masks[m] * w
            m_rec_sum = m_rec.sum()
            metrics[m] = m_rec_sum
            loss_rec = loss_rec + m_rec_sum

        # Per-modality KL(joint || unimodal), mask-zeroed
        kld_losses = 0.0
        for i, m in enumerate(self.encoders):
            mu_m, lv_m = mus[i], log_vars[i]
            kld_m = -0.5 * jnp.sum(
                1.0
                - jnp.exp(joint_log_var - lv_m)
                - (joint_mu - mu_m) ** 2 / jnp.exp(lv_m)
                + joint_log_var
                - lv_m,
                axis=-1,
                dtype=jnp.float32,
            )
            kld_m = jnp.sum(kld_m * batch.masks[m] * w)
            metrics["kld_" + m] = kld_m
            kld_losses = kld_losses + kld_m

        M = float(self.n_modalities)
        rec_weight = (M - self.alpha) / M
        cvib_weight = self.alpha / M
        vib_weight = 1.0 - self.alpha

        kld_weighted = cvib_weight * kld_losses + vib_weight * joint_kld
        total_loss = rec_weight * loss_rec + self.beta * kld_weighted

        return ModelOutput(
            loss=total_loss / n_data, loss_sum=total_loss, metrics=metrics
        )

    # --------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool) -> dict:
        """Reference ``encode`` (``mvtcae_model.py:171-212``): PoE over the
        conditioning subset."""
        joint_mu, joint_log_var, _ = self._joint_posterior(
            params, batch, mods=cond_mod
        )
        z = rsample_from_gaussian(
            rng, joint_mu, joint_log_var, N=N, return_mean=return_mean,
            flatten=flatten,
        )
        return {"z": z}

    def _encode_masked(self, params, batch: MultimodalBatch, rng, subset, *,
                       N: int, return_mean: bool, flatten: bool) -> dict:
        """Same posterior with the subset as a traced (M,) indicator: one
        compiled program serves every conditioning subset (excluded experts
        contribute exactly zero precision, as in the incomplete-data path)."""
        mus, log_vars, mask = self.stacked_gaussian_params(params, batch)
        mu, lv = masked_poe(mus, log_vars, mask * subset[:, None])
        z = rsample_from_gaussian(rng, mu, lv, N=N, return_mean=return_mean,
                                  flatten=flatten)
        return {"z": z}

    # ------------------------------------------------------------ joint NLL
    def compute_joint_nll(self, inputs, K: int = 1000,
                          batch_size_K: int = 100, rng=None):
        """K-sample IWAE joint NLL, chunk-scanned on device.

        Reference: ``mvtcae_model.py:214-289`` (nested per-datapoint host
        loop there; one compiled scan here).
        """
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

    def _joint_nll(self, params, batch: MultimodalBatch, rng, *, K: int,
                   batch_size_K: int):
        joint_mu, joint_log_var, _ = self._joint_posterior(params, batch)
        return self._gaussian_iwae_joint_nll(
            params, batch, joint_mu, joint_log_var, rng, K, batch_size_K
        )
