"""MVAE: PoE over modality subsets with sub-sampled ELBO training, TPU-native.

Behavior parity with reference ``src/multivae/models/mvae/mvae_model.py``.
TPU-first redesign of the subset machinery (SURVEY §7.1): every subset ELBO
is computed from one generic ``(subset row of a precomputed mask matrix)``
function, vmapped over the chosen subsets inside one compiled program. The
reference instead re-encodes per subset in a Python loop (``mvae_model.py:
159-200``) and *filters batch rows* for incomplete data
(``_filter_inputs_with_masks :115``); here filtering becomes a weighted
masked mean with identical normalization (weights = any-available x pad
weight).

Random subset selection (reference draws k subsets with numpy per step,
``:168-172``) is folded into the step RNG with ``jax.random.choice`` so the
compiled program is fixed-shape.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch, as_batch
from ...ops.gaussian import rsample_from_gaussian, stable_poe
from ...ops.subsets import all_subsets, subsets_to_mask
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import BaseMultiVAE, sum_except_batch
from ..base.step import StepInfo
from .mvae_config import MVAEConfig


class MVAE(BaseMultiVAE):
    """The Multi-modal VAE (PoE) model."""

    model_name = "MVAE"
    supports_per_sample_conditioning = True

    def __init__(self, model_config: MVAEConfig, encoders: dict = None,
                 decoders: dict = None, seed: int = 0):
        super().__init__(model_config, encoders, decoders, seed=seed)
        self.subsampling = model_config.use_subsampling
        self.k = model_config.k
        if self.n_modalities <= 2:
            self.k = 0
        self.warmup = model_config.warmup
        self.start_keep_best_epoch = model_config.warmup + 1
        self.beta = model_config.beta

        mods = list(self.encoders.keys())
        # random-candidate subsets: sizes 2..M-1 (reference ``_set_subsets``)
        self.subsets = [s for s in all_subsets(mods, include_full=False)
                        if len(s) >= 2]
        self._random_subset_mask = jnp.asarray(
            subsets_to_mask(self.subsets, mods)
        ) if self.subsets else None
        self._mods = mods
        self.init_params()

    # -------------------------------------------------------- subset pieces
    def _subset_posterior_from_stacked(self, mus, log_vars, mask, subset_row):
        """PoE over the experts selected by ``subset_row`` + prior expert.

        mus/log_vars: (M, B, D); mask: (M, B); subset_row: (M,).
        The prior N(0, I) joins the product (reference ``:75-80``), and the
        PoE is the logsumexp-stabilized form (reference uses ``stable_poe``).
        """
        eff_mask = mask * subset_row[:, None]  # (M, B)
        prior_mu = jnp.zeros_like(mus[:1])
        prior_lv = jnp.zeros_like(log_vars[:1])
        all_mu = jnp.concatenate([mus, prior_mu], axis=0)
        all_lv = jnp.concatenate([log_vars, prior_lv], axis=0)
        all_mask = jnp.concatenate(
            [eff_mask, jnp.ones_like(eff_mask[:1])], axis=0
        )
        return stable_poe(all_mu, all_lv, all_mask)

    def _elbo_subset(self, params, batch, mus, log_vars, mask, subset_row,
                     rng, beta):
        """One subset ELBO (S=1 view of ``_elbo_subsets``)."""
        elbos, klds, recs, n_effs = self._elbo_subsets(
            params, batch, mus, log_vars, mask, subset_row[None],
            rng[None], beta,
        )
        return elbos[0], klds[0], recs[0], n_effs[0]

    def _elbo_subsets(self, params, batch, mus, log_vars, mask, subset_rows,
                      rngs, beta):
        """All requested subset ELBOs in ONE stacked pass.

        Reference ``_compute_elbo_subset`` (``mvae_model.py:82-113``) runs a
        Python loop over subsets, each re-using the batch-sized decoders;
        here the S subsets ride one (S*B)-row decoder application per
        modality (MXU-sized matmuls instead of S small ones — measured
        1.5x+ on the fp32 MLP subset step). The ELBO is averaged over the
        samples that have at least one available modality in the subset
        (the reference filters those rows out of the batch; here they
        carry zero weight).

        subset_rows: (S, M); rngs: (S,) key array. Returns (S,) arrays.
        """
        S = subset_rows.shape[0]
        sub_mu, sub_lv = jax.vmap(
            lambda row: self._subset_posterior_from_stacked(
                mus, log_vars, mask, row)
        )(subset_rows)  # (S, B, D) x2
        z = jax.vmap(rsample_from_gaussian)(rngs, sub_mu, sub_lv)

        # any-available filter (reference ``_filter_inputs_with_masks``)
        avail = jnp.max(
            mask[None] * subset_rows[:, :, None], axis=1)  # (S, B)
        w = avail * batch.weights[None]  # (S, B)
        n_eff = jnp.maximum(w.sum(axis=-1), 1.0)  # (S,)

        B = w.shape[1]
        z_flat = z.reshape((S * B,) + z.shape[2:])
        recon_total = 0.0
        for i, m in enumerate(self._mods):
            recon = self.decode_mod(params, m, z_flat)
            rec_m = sum_except_batch(
                -self.recon_log_probs[m](
                    recon,
                    jnp.broadcast_to(
                        batch.data[m][None],
                        (S,) + batch.data[m].shape,
                    ).reshape((S * B,) + batch.data[m].shape[1:]),
                )
                * self.rescale_factors[m]
            ).reshape(S, B)
            rec_m = rec_m * batch.masks[m][None] * subset_rows[:, i:i + 1]
            recon_total = recon_total + (rec_m * w).sum(axis=-1)  # (S,)

        kld_per_sample = -0.5 * jnp.sum(
            1.0 + sub_lv - sub_mu**2 - jnp.exp(sub_lv), axis=-1,
            dtype=jnp.float32,
        )  # (S, B)
        kld = (kld_per_sample * w).sum(axis=-1)  # (S,)
        elbo = (recon_total + beta * kld) / n_eff
        return elbo, kld / n_eff, recon_total / n_eff, w.sum(axis=-1)

    # ----------------------------------------------------------------- loss
    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo, training: bool = True) -> ModelOutput:
        """Reference ``forward`` (``mvae_model.py:137-204``)."""
        # per-batch beta annealing (reference ``:155-160``)
        beta = jnp.where(
            step.epoch >= self.warmup,
            self.beta,
            (step.epoch - 1.0 + step.batch_ratio)
            / max(self.warmup, 1) * self.beta,
        )

        mus, log_vars, mask = self.stacked_gaussian_params(params, batch)
        M = self.n_modalities
        mods = self._mods

        metrics = {"beta": beta}

        rng, *sub_rngs = jax.random.split(rng, 2 + M + max(self.k, 0))

        # subset rows, in the reference's evaluation order: the joint
        # subset, each unimodal subset, then k random candidate subsets
        # drawn in-program from the step RNG (reference ``:159-172``).
        rows = [jnp.ones((1, M), jnp.float32)]
        use_random = (self.subsampling and self.k > 0 and training
                      and self._random_subset_mask is not None)
        if self.subsampling:
            rows.append(jnp.eye(M, dtype=jnp.float32))
        if use_random:
            rng, choice_rng = jax.random.split(rng)
            idx = jax.random.choice(
                choice_rng, self._random_subset_mask.shape[0],
                shape=(self.k,), replace=False,
            )
            rows.append(self._random_subset_mask[idx])  # (k, M)
        rows = jnp.concatenate(rows, axis=0)  # (S, M)
        keys = jnp.stack(sub_rngs[:rows.shape[0]])

        elbos, klds, recs, n_effs = self._elbo_subsets(
            params, batch, mus, log_vars, mask, rows, keys, beta
        )

        joint_name = "_".join(sorted(mods))
        metrics[joint_name] = elbos[0]
        metrics["kld" + joint_name] = klds[0]
        metrics["recon" + joint_name] = recs[0]
        if self.subsampling:
            for i, m in enumerate(mods):
                metrics[m] = elbos[1 + i]
                metrics["kld" + m] = klds[1 + i]
                metrics["recon" + m] = recs[1 + i]
        if use_random:
            for j in range(self.k):
                metrics[f"random_subset_{j}"] = elbos[1 + M + j]

        total_loss = jnp.sum(elbos)
        n_eff_last = n_effs[-1]
        return ModelOutput(
            loss=total_loss, loss_sum=total_loss * n_eff_last, metrics=metrics
        )

    def eval_loss_function(self, params, batch, rng, step) -> ModelOutput:
        """Eval objective: no random subsets (reference gates on
        ``self.training``, ``mvae_model.py:168``)."""
        return self.loss_function(params, batch, rng, step, training=False)

    # --------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool) -> dict:
        """Reference ``encode`` (``mvae_model.py:206-238``)."""
        mus, log_vars, mask = self.stacked_gaussian_params(
            params, batch, mods=cond_mod
        )
        row = jnp.ones((len(cond_mod),), jnp.float32)
        sub_mu, sub_lv = self._subset_posterior_from_stacked(
            mus, log_vars, mask, row
        )
        z = rsample_from_gaussian(rng, sub_mu, sub_lv, N=N,
                                  return_mean=return_mean, flatten=flatten)
        return {"z": z}

    def _encode_masked(self, params, batch: MultimodalBatch, rng, subset, *,
                       N: int, return_mean: bool, flatten: bool) -> dict:
        """Subset as a traced (M,) indicator row of the PoE (prior expert
        included): one compiled program serves every conditioning subset
        (see ``BaseMultiVAE._encode_masked``)."""
        mus, log_vars, mask = self.stacked_gaussian_params(params, batch)
        sub_mu, sub_lv = self._subset_posterior_from_stacked(
            mus, log_vars, mask, subset
        )
        z = rsample_from_gaussian(rng, sub_mu, sub_lv, N=N,
                                  return_mean=return_mean, flatten=flatten)
        return {"z": z}

    # ------------------------------------------------------------ joint NLL
    def compute_joint_nll(self, inputs, K: int = 1000,
                          batch_size_K: int = 100, rng=None):
        """Reference ``compute_joint_nll`` (``mvae_model.py:240-319``)."""
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
        mus, log_vars, mask = self.stacked_gaussian_params(params, batch)
        row = jnp.ones((self.n_modalities,), jnp.float32)
        joint_mu, joint_lv = self._subset_posterior_from_stacked(
            mus, log_vars, mask, row
        )
        return self._gaussian_iwae_joint_nll(
            params, batch, joint_mu, joint_lv, rng, K, batch_size_K
        )
