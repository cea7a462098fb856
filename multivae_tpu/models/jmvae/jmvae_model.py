"""JMVAE: joint-encoder ELBO + KL(joint||unimodal) regularization.

Behavior parity with reference ``src/multivae/models/jmvae/jmvae_model.py``:
joint encoder ELBO + alpha * sum_m KL(q(z|X)||q(z|x_m)) with linear warmup
annealing; subset encoding via the exact PoE of unimodal Gaussians
(``jmvae_model.py:194-208``).
"""

from __future__ import annotations


import jax.numpy as jnp

from ...data.batch import MultimodalBatch
from ...ops.gaussian import rsample_from_gaussian, stable_poe
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import sum_except_batch
from ..base.step import StepInfo
from ..joint_models.joint_model import BaseJointModel
from .jmvae_config import JMVAEConfig


class JMVAE(BaseJointModel):
    """The Joint Multimodal Variational Autoencoder."""

    model_name = "JMVAE"

    def __init__(self, model_config: JMVAEConfig, encoders: dict = None,
                 decoders: dict = None, joint_encoder=None, seed: int = 0,
                 **kwargs):
        super().__init__(model_config, encoders, decoders, joint_encoder,
                         seed=seed, **kwargs)
        self.alpha = model_config.alpha
        self.warmup = model_config.warmup
        self.start_keep_best_epoch = model_config.warmup + 1
        self.beta = model_config.beta
        self.init_params()

    # ----------------------------------------------------------------- loss
    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo) -> ModelOutput:
        """Reference ``forward`` (``jmvae_model.py:116-192``)."""
        joint = self.apply_joint_encoder(params, batch.data)
        mu, log_var = joint["embedding"], joint["log_covariance"]
        w = batch.weights
        n_data = jnp.maximum(w.sum(), 1.0)

        z_joint = rsample_from_gaussian(rng, mu, log_var)

        recon_loss = 0.0
        for mod in self.decoders:
            recon = self.decode_mod(params, mod, z_joint)
            rec = sum_except_batch(
                -self.recon_log_probs[mod](recon, batch.data[mod])
                * self.rescale_factors[mod]
            )
            recon_loss = recon_loss + (rec * w).sum()

        kld = -0.5 * jnp.sum(
            (1.0 + log_var - mu**2 - jnp.exp(log_var)).sum(
                -1, dtype=jnp.float32) * w
        ) * self.beta

        ljm = 0.0
        for mod in self.encoders:
            out = self.encode_mod(params, mod, batch.data[mod])
            uni_mu, uni_lv = out["embedding"], out["log_covariance"]
            term = 0.5 * (
                uni_lv - log_var
                + (jnp.exp(log_var) + (mu - uni_mu) ** 2) / jnp.exp(uni_lv)
                - 1.0
            )
            ljm = ljm + (term.sum(-1, dtype=jnp.float32) * w).sum()
        ljm = ljm * self.alpha

        reg_loss = kld + ljm
        annealing = jnp.where(
            step.epoch >= self.warmup, 1.0, step.epoch / max(self.warmup, 1)
        )
        elbo = (recon_loss + kld) / n_data
        loss_sum = recon_loss + annealing * reg_loss
        loss = loss_sum / n_data

        metrics = {
            "loss_no_ponderation": reg_loss + recon_loss,
            "beta": annealing,
            "elbo": elbo,
        }
        return ModelOutput(loss=loss, loss_sum=loss_sum, metrics=metrics)

    # --------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool) -> dict:
        """Reference ``encode`` (``jmvae_model.py:57-114``): joint encoder
        for all modalities, exact PoE of unimodal posteriors for subsets,
        unimodal encoder for singletons."""
        if len(cond_mod) == self.n_modalities:
            out = self.apply_joint_encoder(params, batch.data)
            mu, lv = out["embedding"], out["log_covariance"]
        elif len(cond_mod) == 1:
            out = self.encode_mod(params, cond_mod[0], batch.data[cond_mod[0]])
            mu, lv = out["embedding"], out["log_covariance"]
        else:
            mus, lvs = [], []
            for m in cond_mod:
                o = self.encode_mod(params, m, batch.data[m])
                mus.append(o["embedding"])
                lvs.append(o["log_covariance"])
            mu, lv = stable_poe(jnp.stack(mus), jnp.stack(lvs))
        z = rsample_from_gaussian(rng, mu, lv, N=N, return_mean=return_mean,
                                  flatten=flatten)
        return {"z": z}

    def _encode_masked(self, params, batch: MultimodalBatch, rng, subset, *,
                       N: int, return_mean: bool, flatten: bool) -> dict:
        """Subset as a traced (M,) indicator: the joint-encoder (full set)
        and masked exact-PoE (any proper subset; a single unmasked expert
        IS that unimodal posterior) branches are both computed and selected
        by a traced flag, so ONE compiled program serves every subset."""
        jout = self.apply_joint_encoder(params, batch.data)
        mus, lvs = [], []
        for m in self.encoders:
            o = self.encode_mod(params, m, batch.data[m])
            mus.append(o["embedding"])
            lvs.append(o["log_covariance"])
        B = mus[0].shape[0]
        mask = jnp.broadcast_to(subset[:, None], (len(mus), B))
        poe_mu, poe_lv = stable_poe(jnp.stack(mus), jnp.stack(lvs), mask)
        is_full = subset.sum() == self.n_modalities
        mu = jnp.where(is_full, jout["embedding"], poe_mu)
        lv = jnp.where(is_full, jout["log_covariance"], poe_lv)
        z = rsample_from_gaussian(rng, mu, lv, N=N, return_mean=return_mean,
                                  flatten=flatten)
        return {"z": z}
