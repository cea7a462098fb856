"""MoPoE: Mixture of Products of Experts, TPU-native.

Behavior parity with reference ``src/multivae/models/mopoe/mopoe_model.py``
(itself based on the official MoPoE code). TPU-first redesign (SURVEY §7.1):

- The reference loops over the 2^M - 1 subsets in Python, re-stacking
  encoder outputs per subset (``mopoe_model.py:291-322``). Here ALL subset
  PoE posteriors are computed at once with one einsum over a precomputed
  (n_subsets x M) membership matrix: T_s = sum_m S[s,m] * precision_m.
- Mixture-component selection (random over available subsets for incomplete
  data ``:417-433``, deterministic balanced split for complete data
  ``:435-465``) becomes a one-hot einsum gather, keeping the whole forward
  one compiled program.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch, as_batch
from ...nn.default_architectures import (
    BaseDictDecodersMultiLatents,
    BaseDictEncoders_MultiLatents,
)
from ...ops.gaussian import gaussian_log_prob, rsample_from_gaussian
from ...ops.iwae import iwae_log_marginal
from ...ops.subsets import all_subsets, subsets_to_mask
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import BaseMultiVAE, sum_except_batch
from ..base.step import StepInfo
from .mopoe_config import MoPoEConfig


class MoPoE(BaseMultiVAE):
    """Mixture of Products of Experts multimodal VAE."""

    model_name = "MoPoE"

    def __init__(self, model_config: MoPoEConfig, encoders: dict = None,
                 decoders: dict = None, seed: int = 0):
        self._multilatent = model_config.modalities_specific_dim is not None
        super().__init__(model_config, encoders, decoders, seed=seed)
        self.multiple_latent_spaces = self._multilatent
        if self._multilatent:
            self.style_dims = dict(model_config.modalities_specific_dim)
        self.beta = model_config.beta
        self.beta_style = model_config.beta_style

        list_subsets = model_config.subsets
        if isinstance(list_subsets, dict):
            list_subsets = list(list_subsets.values())
        if list_subsets is None:
            list_subsets = all_subsets(list(self.encoders.keys()))
        self.set_subsets(list_subsets)
        self.init_params()

    # ------------------------------------------------------------- networks
    def default_encoders(self, model_config) -> dict:
        if model_config.modalities_specific_dim is not None:
            return BaseDictEncoders_MultiLatents(
                input_dims=model_config.input_dims,
                latent_dim=model_config.latent_dim,
                modality_dims=model_config.modalities_specific_dim,
            )
        return super().default_encoders(model_config)

    def default_decoders(self, model_config) -> dict:
        if model_config.modalities_specific_dim is not None:
            return BaseDictDecodersMultiLatents(
                input_dims=model_config.input_dims,
                latent_dim=model_config.latent_dim,
                modality_dims=model_config.modalities_specific_dim,
            )
        return super().default_decoders(model_config)

    def _decoder_input_dim(self, mod: str) -> int:
        if self._multilatent:
            return self.latent_dim + self.model_config.modalities_specific_dim[mod]
        return self.latent_dim

    # -------------------------------------------------------------- subsets
    def set_subsets(self, subsets_list):
        """Build the subset dict + membership matrix.

        Reference ``set_subsets`` (``mopoe_model.py:87-106``): keys are
        sorted-joined modality names.
        """
        mods = list(self.encoders.keys())
        subsets = {}
        for mod_names in subsets_list:
            clean = []
            for mod_name in sorted(mod_names):
                if mod_name not in self.encoders and mod_name != "":
                    raise AttributeError(
                        "The provided subsets list contains unknown modality "
                        f"name {mod_name}."
                    )
                clean.append(mod_name)
            if not clean:
                continue  # skip the empty subset (reference skips key "")
            subsets["_".join(clean)] = clean
        self.subsets = subsets
        self.model_config.subsets = subsets
        self._subset_names = list(subsets.keys())
        self._subset_mask = jnp.asarray(
            subsets_to_mask(list(subsets.values()), mods)
        )  # (S, M)
        # the reference adds the prior expert only for the full subset
        self._full_subset_flag = jnp.asarray(
            (np.asarray(self._subset_mask).sum(-1) == len(mods)).astype(
                np.float32
            )
        )

    def _all_subset_posteriors(self, params, batch: MultimodalBatch,
                               eps: float = 1e-8):
        """All subset PoE posteriors in one einsum.

        Returns (mus_sub, lvs_sub) of shape (S, B, D) plus the per-modality
        encoder outputs. Reference ``inference`` (``mopoe_model.py:274-350``)
        loops; the math matches ``poe`` + ``_poe_fusion`` (prior expert for
        the full subset only, ``:249-262``).
        """
        enc_outputs = {m: self.encode_mod(params, m, batch.data[m])
                       for m in self.encoders}
        mus = jnp.stack([enc_outputs[m]["embedding"] for m in self.encoders])
        lvs = jnp.stack(
            [enc_outputs[m]["log_covariance"] for m in self.encoders]
        )  # (M, B, D)

        precision = 1.0 / (jnp.exp(lvs) + eps)                # (M, B, D)
        weighted_mu = mus * precision                          # (M, B, D)
        S = self._subset_mask                                  # (S, M)
        T_sub = jnp.einsum("sm,mbd->sbd", S, precision)
        mu_sub = jnp.einsum("sm,mbd->sbd", S, weighted_mu)
        # prior expert N(0, I) only for the full subset
        prior_T = self._full_subset_flag[:, None, None] / (1.0 + eps)
        T_sub = T_sub + prior_T
        mus_sub = mu_sub / T_sub
        lvs_sub = -jnp.log(T_sub)
        return mus_sub, lvs_sub, enc_outputs

    def _availabilities(self, batch: MultimodalBatch):
        """(S, B) float: subset available iff ALL its modalities available.

        Reference ``subset_mask`` (``mopoe_model.py:264-272``).
        """
        mask = jnp.stack([batch.masks[m] for m in self.encoders])  # (M, B)
        S = self._subset_mask  # (S, M)
        # subset unavailable if any member modality missing
        missing = jnp.einsum("sm,mb->sb", S, 1.0 - mask)
        return (missing == 0).astype(jnp.float32)

    def _select_component(self, mus_sub, lvs_sub, weights, rng,
                          deterministic: bool):
        """Pick one subset posterior per sample as a one-hot einsum.

        deterministic: balanced index-range split (reference ``:435-465``);
        random: categorical over availability weights (reference ``:417-433``).
        """
        S, B, D = mus_sub.shape
        if deterministic:
            # reference splits samples into equal index ranges per subset
            idx = jnp.minimum(
                (jnp.arange(B) // max(B // S, 1)).astype(jnp.int32), S - 1
            )
            onehot = jax.nn.one_hot(idx, S, dtype=mus_sub.dtype)  # (B, S)
        else:
            logits = jnp.log(jnp.maximum(weights.T, 1e-12))  # (B, S)
            choice = jax.random.categorical(rng, logits, axis=-1)
            onehot = jax.nn.one_hot(choice, S, dtype=mus_sub.dtype)
        jmu = jnp.einsum("bs,sbd->bd", onehot, mus_sub)
        jlv = jnp.einsum("bs,sbd->bd", onehot, lvs_sub)
        return jmu, jlv

    def _inference(self, params, batch: MultimodalBatch, rng,
                   incomplete: bool):
        mus_sub, lvs_sub, enc_outputs = self._all_subset_posteriors(
            params, batch
        )
        S = mus_sub.shape[0]
        B = mus_sub.shape[1]
        if incomplete:
            avail = self._availabilities(batch)            # (S, B)
            weights = avail / jnp.maximum(avail.sum(0), 1e-12)
            jmu, jlv = self._select_component(
                mus_sub, lvs_sub, weights, rng, deterministic=False
            )
        else:
            weights = jnp.full((S, B), 1.0 / S, mus_sub.dtype)
            jmu, jlv = self._select_component(
                mus_sub, lvs_sub, weights, rng, deterministic=True
            )
        return {
            "mus": mus_sub, "logvars": lvs_sub, "weights": weights,
            "joint": (jmu, jlv), "modalities": enc_outputs,
        }

    # ----------------------------------------------------------------- loss
    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo) -> ModelOutput:
        """Reference ``forward`` (``mopoe_model.py:147-247``)."""
        rng, sel_rng, z_rng, style_rng = jax.random.split(rng, 4)
        # static branch mirroring the reference's hasattr(inputs, "masks"):
        # incomplete data -> random selection over available subsets;
        # complete data -> deterministic balanced split (``:330-343``).
        latents = self._inference(params, batch, sel_rng, batch.incomplete)

        jmu, jlv = latents["joint"]
        z = rsample_from_gaussian(z_rng, jmu, jlv)
        w = batch.weights
        n_data = jnp.maximum(w.sum(), 1.0)

        # joint divergence: weighted sum over subsets of standard-normal KLs
        klds = -0.5 * jnp.sum(
            1.0 - jnp.exp(latents["logvars"]) - latents["mus"] ** 2
            + latents["logvars"], axis=-1, dtype=jnp.float32,
        )  # (S, B)
        group_div = ((latents["weights"] * klds).sum(0) * w).sum() / n_data

        metrics = {"joint_divergence": group_div}

        loss = 0.0
        kld = group_div
        style_rngs = jax.random.split(style_rng, len(self.encoders))
        for i, m in enumerate(self.encoders):
            if self._multilatent:
                style_mu = latents["modalities"][m]["style_embedding"]
                style_lv = latents["modalities"][m]["style_log_covariance"]
                style_z = rsample_from_gaussian(style_rngs[i], style_mu,
                                                style_lv)
                full_embedding = jnp.concatenate([z, style_z], axis=-1)
            else:
                full_embedding = z

            recon = self.decode_mod(params, m, full_embedding)
            m_rec = sum_except_batch(
                -self.recon_log_probs[m](recon, batch.data[m])
                * self.rescale_factors[m]
            )
            rec_m = (m_rec * batch.masks[m] * w).sum() / n_data
            metrics["recon_" + m] = rec_m
            loss = loss + rec_m

            if self._multilatent:
                style_kld = -0.5 * jnp.sum(
                    1.0 - jnp.exp(style_lv) - style_mu**2 + style_lv, axis=-1, dtype=jnp.float32
                )
                style_kld = (style_kld * batch.masks[m] * w).sum() / n_data
                kld = kld + style_kld * self.beta_style

        loss = loss + self.beta * kld
        return ModelOutput(loss=loss, loss_sum=loss * n_data, metrics=metrics)

    # --------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool) -> dict:
        """Reference ``encode`` (``mopoe_model.py:352-415``): PoE posterior
        of the matching subset; private codes from posteriors (cond mods) or
        the prior (others)."""
        key = "_".join(sorted(cond_mod))
        if key not in self._subset_names:
            raise AttributeError(
                f"Subset {key} is not in the model's subsets; cannot encode."
            )
        s_idx = self._subset_names.index(key)

        mus_sub, lvs_sub, enc_outputs = self._all_subset_posteriors(
            params, batch
        )
        mu, log_var = mus_sub[s_idx], lvs_sub[s_idx]
        if return_mean and len(cond_mod) == self.n_modalities:
            mu = mus_sub.mean(0)  # aggregate posterior mean (reference quirk)

        rng, z_rng = jax.random.split(rng)
        z = rsample_from_gaussian(z_rng, mu, log_var, N=N,
                                  return_mean=return_mean, flatten=flatten)
        out = {"z": z}

        if self._multilatent:
            modalities_z = {}
            mod_rngs = jax.random.split(rng, len(self.encoders))
            for i, m in enumerate(self.encoders):
                if m in cond_mod:
                    mu_s = enc_outputs[m]["style_embedding"]
                    lv_s = enc_outputs[m]["style_log_covariance"]
                else:
                    B = mu.shape[0]
                    mu_s = jnp.zeros((B, self.style_dims[m]))
                    lv_s = jnp.zeros((B, self.style_dims[m]))
                modalities_z[m] = rsample_from_gaussian(
                    mod_rngs[i], mu_s, lv_s, N=N, return_mean=return_mean,
                    flatten=flatten,
                )
            out["modalities_z"] = modalities_z
        return out

    def subset_indicator(self, cond_mod: tuple):
        """Host-side validation of the masked-encode path: the subset must
        be one of the model's configured subsets (reference refuses unknown
        subsets, ``mopoe_model.py:360-368``)."""
        key = "_".join(sorted(cond_mod))
        if key not in self._subset_names:
            raise AttributeError(
                f"Subset {key} is not in the model's subsets; cannot encode."
            )
        return super().subset_indicator(cond_mod)

    def _encode_masked(self, params, batch: MultimodalBatch, rng, subset, *,
                       N: int, return_mean: bool, flatten: bool) -> dict:
        """Subset as a traced (M,) indicator: the matching row of the
        (S, M) subset matrix is selected by exact-match one-hot einsum, so
        ONE compiled program serves every conditioning subset. Private
        codes multiply by the indicator (the prior is N(0, I), so
        ``sel * posterior_params`` IS the posterior-or-prior select)."""
        mus_sub, lvs_sub, enc_outputs = self._all_subset_posteriors(
            params, batch
        )
        onehot = jnp.all(self._subset_mask == subset[None, :],
                         axis=1).astype(mus_sub.dtype)  # (S,)
        mu = jnp.einsum("s,sbd->bd", onehot, mus_sub)
        log_var = jnp.einsum("s,sbd->bd", onehot, lvs_sub)
        if return_mean:
            # aggregate-posterior-mean quirk for the full subset
            is_full = subset.sum() == self.n_modalities
            mu = jnp.where(is_full, mus_sub.mean(0), mu)

        rng, z_rng = jax.random.split(rng)
        z = rsample_from_gaussian(z_rng, mu, log_var, N=N,
                                  return_mean=return_mean, flatten=flatten)
        out = {"z": z}

        if self._multilatent:
            modalities_z = {}
            mod_rngs = jax.random.split(rng, len(self.encoders))
            for i, m in enumerate(self.encoders):
                mu_s = subset[i] * enc_outputs[m]["style_embedding"]
                lv_s = subset[i] * enc_outputs[m]["style_log_covariance"]
                modalities_z[m] = rsample_from_gaussian(
                    mod_rngs[i], mu_s, lv_s, N=N, return_mean=return_mean,
                    flatten=flatten,
                )
            out["modalities_z"] = modalities_z
        return out

    # ------------------------------------------------------------ joint NLL
    def compute_joint_nll(self, inputs, K: int = 1000,
                          batch_size_K: int = 100, rng=None):
        """Mixture-aware IWAE NLL (reference ``mopoe_model.py:467-594``):
        sample from the selected-component posterior, weight with the full
        mixture density log-mean-exp over subsets."""
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

    def _private_terms(self, params, batch, enc_outputs, rng, chunk):
        """Sample private latents + their prior/posterior terms (multilatent)."""
        private_z = {}
        lpz = 0.0
        lqz = 0.0
        rngs = jax.random.split(rng, len(self.encoders))
        for i, m in enumerate(self.encoders):
            mu_s = enc_outputs[m]["style_embedding"]
            lv_s = enc_outputs[m]["style_log_covariance"]
            z_s = rsample_from_gaussian(rngs[i], mu_s, lv_s, N=chunk)
            private_z[m] = z_s
            lpz = lpz + jnp.sum(
                gaussian_log_prob(z_s, jnp.zeros_like(z_s),
                                  jnp.zeros_like(z_s)), axis=-1, dtype=jnp.float32,
            )
            lqz = lqz + jnp.sum(
                gaussian_log_prob(z_s, mu_s[None], lv_s[None]), axis=-1, dtype=jnp.float32
            )
        return private_z, lpz, lqz

    def _recon_logprob(self, params, batch, z, private_z):
        lpx_z = 0.0
        for m in self.decoders:
            if self._multilatent:
                emb = jnp.concatenate([z, private_z[m]], axis=-1)
            else:
                emb = z
            recon = self.decode_mod(params, m, emb)
            lpx_z = lpx_z + sum_except_batch(
                self.recon_log_probs[m](recon, batch.data[m][None]),
                batch_ndims=2,
            )
        return lpx_z

    def _joint_nll(self, params, batch, rng, *, K, batch_size_K):
        rng, sel_rng = jax.random.split(rng)
        latents = self._inference(params, batch, sel_rng, incomplete=False)
        jmu, jlv = latents["joint"]
        mus_sub, lvs_sub = latents["mus"], latents["logvars"]
        enc_outputs = latents["modalities"]
        S = mus_sub.shape[0]

        def logw_chunk(rng, chunk: int):
            rng, z_rng, p_rng = jax.random.split(rng, 3)
            z = rsample_from_gaussian(z_rng, jmu, jlv, N=chunk)
            private_z, lpz_priv, lqz_priv = (
                self._private_terms(params, batch, enc_outputs, p_rng, chunk)
                if self._multilatent else ({}, 0.0, 0.0)
            )
            lpx_z = self._recon_logprob(params, batch, z, private_z)
            lpz = jnp.sum(
                gaussian_log_prob(z, jnp.zeros_like(z), jnp.zeros_like(z)),
                axis=-1,
            ) + lpz_priv
            # mixture density: log (1/S sum_s q_s(z))
            lqz_per_subset = jnp.sum(
                gaussian_log_prob(
                    z[None], mus_sub[:, None], lvs_sub[:, None]
                ), axis=-1, dtype=jnp.float32,
            )  # (S, chunk, B)
            lqz = (
                jax.nn.logsumexp(lqz_per_subset, axis=0) - jnp.log(float(S))
                + lqz_priv
            )
            return lpx_z + lpz - lqz

        ln_px = iwae_log_marginal(logw_chunk, rng, K, batch_size_K)
        # weights are 1 for real rows and 0 for loader padding rows, so the
        # evaluator can keep one compiled shape across partial final batches.
        return -jnp.sum(ln_px * batch.weights)

    def _compute_joint_nll_from_subset_encoding(self, subset, inputs,
                                                K: int = 1000,
                                                batch_size_K: int = 100,
                                                rng=None):
        """IWAE NLL with a subset PoE posterior as importance distribution
        (reference ``mopoe_model.py:596-700``)."""
        batch = as_batch(inputs)
        self._check_complete_for_nll(inputs)
        params = self._ensure_params()
        if rng is None:
            rng = self.next_rng()
        key = "_".join(sorted(subset))
        fn = self._jit(
            ("joint_nll_subset", key, K, batch_size_K),
            partial(self._joint_nll_paper, subset_key=key, K=K,
                    batch_size_K=batch_size_K),
        )
        return fn(params, batch, rng)

    def compute_joint_nll_paper(self, inputs, K: int = 1000,
                                batch_size_K: int = 100, rng=None):
        """PoE-posterior IWAE NLL as in the original paper implementation
        (reference ``mopoe_model.py:703-717``)."""
        return self._compute_joint_nll_from_subset_encoding(
            list(self.encoders.keys()), inputs, K, batch_size_K, rng
        )

    def _joint_nll_paper(self, params, batch, rng, *, subset_key, K,
                         batch_size_K):
        mus_sub, lvs_sub, enc_outputs = self._all_subset_posteriors(
            params, batch
        )
        full_idx = self._subset_names.index(subset_key)
        jmu, jlv = mus_sub[full_idx], lvs_sub[full_idx]

        def logw_chunk(rng, chunk: int):
            rng, z_rng, p_rng = jax.random.split(rng, 3)
            z = rsample_from_gaussian(z_rng, jmu, jlv, N=chunk)
            private_z, lpz_priv, lqz_priv = (
                self._private_terms(params, batch, enc_outputs, p_rng, chunk)
                if self._multilatent else ({}, 0.0, 0.0)
            )
            lpx_z = self._recon_logprob(params, batch, z, private_z)
            lpz = jnp.sum(
                gaussian_log_prob(z, jnp.zeros_like(z), jnp.zeros_like(z)),
                axis=-1,
            ) + lpz_priv
            lqz = jnp.sum(
                gaussian_log_prob(z, jmu[None], jlv[None]), axis=-1, dtype=jnp.float32
            ) + lqz_priv
            return lpx_z + lpz - lqz

        ln_px = iwae_log_marginal(logw_chunk, rng, K, batch_size_K)
        # weights are 1 for real rows and 0 for loader padding rows, so the
        # evaluator can keep one compiled shape across partial final batches.
        return -jnp.sum(ln_px * batch.weights)
