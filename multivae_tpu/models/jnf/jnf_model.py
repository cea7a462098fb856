"""JNF: joint VAE + per-modality normalizing flows, TPU-native.

Behavior parity with reference ``src/multivae/models/jnf/jnf_model.py``:
stage 1 trains the joint ELBO; stage 2 freezes the joint VAE and trains
per-modality MAF flows to match unimodal posteriors to joint samples (the
L_JM loss, ``:162-182``). Subset inference samples the PoE of flow
posteriors with Hamiltonian Monte Carlo (``:343-436``); on TPU the HMC is a
``lax.fori_loop`` over MCMC steps with leapfrog integration and
``jax.grad`` of the flow log-density — one compiled program instead of the
reference's per-step host loop.
"""

from __future__ import annotations

import logging
import math
from functools import partial
from typing import Dict, Union

import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch
from ...ops.flows import MAF
from ...ops.gaussian import rsample_from_gaussian
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import sum_except_batch
from ..base.step import StepInfo
from ..joint_models.joint_model import BaseJointModel
from .jnf_config import JNFConfig

logger = logging.getLogger(__name__)
_LOG_2PI = math.log(2.0 * math.pi)


class JNF(BaseJointModel):
    """The JNF model (needs the MultistageTrainer)."""

    model_name = "JNF"

    def __init__(self, model_config: JNFConfig, encoders: dict = None,
                 decoders: dict = None, joint_encoder=None,
                 flows: Dict = None, seed: int = 0, **kwargs):
        super().__init__(model_config, encoders, decoders, joint_encoder,
                         seed=seed, **kwargs)
        if flows is None:
            flows = self._default_flows(model_config)
        else:
            self.model_config.custom_architectures.append("flows")
        self._set_flows(flows)

        self.warmup = model_config.warmup
        self.reset_optimizer_epochs = [self.warmup + 1]
        self.beta = model_config.beta
        self.current_stage = 1
        self.init_params()

    def _default_flows(self, model_config):
        """Default MAF flow per modality (reference ``:73-78``)."""
        return {m: MAF(input_dim=model_config.latent_dim)
                for m in self.encoders}

    def _set_flows(self, flows: dict):
        import flax.linen as nn

        if flows.keys() != self.encoders.keys():
            raise AttributeError(
                f"The keys of provided flows: {list(flows.keys())} don't "
                f"match the keys provided in encoders "
                f"{list(self.encoders.keys())} or input_dims."
            )
        for m, f in flows.items():
            if not isinstance(f, nn.Module) or getattr(f, "input_dim", None) \
                    != self.latent_dim:
                raise AttributeError(
                    "The provided flows must be flax flow modules with "
                    "input_dim equal to the latent dimension."
                )
        self.flows = dict(flows)

    def _init_extra_modules(self, rng) -> dict:
        extra = super()._init_extra_modules(rng)
        rngs = jax.random.split(rng, len(self.flows) + 1)
        extra["flows"] = {
            m: self.flows[m].init(rngs[i + 1],
                                  jnp.zeros((1, self.latent_dim)))["params"]
            for i, m in enumerate(self.flows)
        }
        return extra

    def apply_flow(self, params, mod: str, z) -> ModelOutput:
        return self.flows[mod].apply({"params": params["flows"][mod]}, z)

    def apply_flow_inverse(self, params, mod: str, u) -> ModelOutput:
        return self.flows[mod].apply(
            {"params": params["flows"][mod]}, u,
            method=type(self.flows[mod]).inverse,
        )

    # -------------------------------------------------------------- staging
    def stage_for_epoch(self, epoch: int) -> int:
        return 1 if epoch <= self.warmup else 2

    def set_stage(self, stage: int) -> bool:
        if stage != self.current_stage:
            self.current_stage = stage
            self._jit_cache.clear()
            return True
        return False

    # ----------------------------------------------------------------- loss
    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo) -> ModelOutput:
        """Reference ``forward`` (``jnf_model.py:109-160``)."""
        w = batch.weights
        n_data = jnp.maximum(w.sum(), 1.0)

        joint = self.apply_joint_encoder(params, batch.data)
        mu, log_var = joint["embedding"], joint["log_covariance"]
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

        if self.current_stage == 1:
            loss_sum = recon_loss + kld
            return ModelOutput(
                loss=loss_sum / n_data, loss_sum=loss_sum,
                metrics={"kld_prior": kld,
                         "recon_loss": recon_loss / n_data,
                         "ljm": jnp.zeros(())},
            )

        # stage 2: freeze the joint VAE, train the flows on L_JM
        frozen = dict(params)
        frozen["joint_encoder"] = jax.lax.stop_gradient(
            params["joint_encoder"])
        frozen["decoders"] = jax.lax.stop_gradient(params["decoders"])
        frozen["encoders"] = params["encoders"]
        joint = self.apply_joint_encoder(frozen, batch.data)
        z_joint = rsample_from_gaussian(
            rng, joint["embedding"],
            joint["log_covariance"],
        )
        ljm = self._compute_ljm(frozen, batch, z_joint, w)
        return ModelOutput(
            loss=ljm / n_data, loss_sum=ljm,
            metrics={"kld_prior": kld, "recon_loss": recon_loss / n_data,
                     "ljm": ljm / n_data},
        )

    def _compute_ljm(self, params, batch, z_joint, w):
        """-sum_m log q_m(z_joint|x_m) through the flows
        (reference ``:162-182``)."""
        ljm = 0.0
        for mod in self.encoders:
            out = self.encode_mod(params, mod, batch.data[mod])
            mu0, lv0 = out["embedding"], out["log_covariance"]
            flow_out = self.apply_flow(params, mod, z_joint)
            z0 = flow_out["out"]
            log_q_z0 = (
                -0.5 * (lv0 + _LOG_2PI + (z0 - mu0) ** 2 / jnp.exp(lv0))
            ).sum(-1, dtype=jnp.float32)
            ljm = ljm + (-(log_q_z0 + flow_out["log_abs_det_jac"]) * w).sum()
        return ljm

    # --------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool, mcmc_steps: int = 100, n_lf: int = 10,
                       eps_lf: float = 0.01) -> dict:
        """Reference ``encode`` (``jnf_model.py:184-269``)."""
        if len(cond_mod) == self.n_modalities:
            out = self.apply_joint_encoder(params, batch.data)
            z = rsample_from_gaussian(rng, out["embedding"],
                                      out["log_covariance"], N=N,
                                      return_mean=return_mean)
        elif len(cond_mod) == 1:
            mod = cond_mod[0]
            out = self.encode_mod(params, mod, batch.data[mod])
            z0 = rsample_from_gaussian(rng, out["embedding"],
                                       out["log_covariance"], N=N,
                                       return_mean=return_mean)
            flow_out = self.apply_flow_inverse(
                params, mod, z0.reshape(-1, self.latent_dim)
            )
            z = flow_out["out"].reshape(z0.shape)
        else:
            z = self._sample_from_poe_subset(
                params, batch, cond_mod, rng, mcmc_steps=mcmc_steps,
                n_lf=n_lf, eps_lf=eps_lf, K=N, divide_prior=True,
            )
        if N > 1 and flatten:
            z = z.reshape(-1, self.latent_dim)
        return {"z": z}

    def encode(self, inputs, cond_mod="all", N: int = 1,
               return_mean: bool = False, flatten: bool = False, rng=None,
               ignore_incomplete: bool = False, mcmc_steps: int = 100,
               n_lf: int = 10, eps_lf: float = 0.01, **kwargs):
        """Adds the HMC hyperparameters to the base signature."""
        from ...data.batch import as_batch

        params = self._ensure_params()
        batch = as_batch(inputs)
        self._reject_incomplete(inputs)
        cond = self._normalize_cond_mod(cond_mod)
        if rng is None:
            rng = self.next_rng()
        key = ("encode", cond, N, bool(return_mean), bool(flatten),
               mcmc_steps, n_lf, float(eps_lf), self.current_stage)
        fn = self._jit(
            key,
            partial(self._encode_subset, cond_mod=cond, N=N,
                    return_mean=bool(return_mean), flatten=bool(flatten),
                    mcmc_steps=mcmc_steps, n_lf=n_lf, eps_lf=eps_lf),
        )
        out = fn(params, batch, rng)
        result = ModelOutput(z=out["z"], one_latent_space=True)
        result["cond_mod"] = list(cond)
        return result

    # ------------------------------------------------------------------ HMC
    def _poe_log_density(self, params, z, enc_params, subset,
                         divide_prior: bool):
        """log density of the PoE of flow posteriors at z
        (reference ``_compute_poe_posterior`` ``:295-341``)."""
        lnqzs = 0.0
        if divide_prior:
            lnqzs = lnqzs + (0.5 * (z**2 + _LOG_2PI)).sum(
                -1, dtype=jnp.float32)
        for m in subset:
            flow_out = self.apply_flow(params, m, z)
            z0 = flow_out["out"]
            mu, lv = enc_params[m]
            log_q_z0 = (
                -0.5 * (lv + _LOG_2PI + (z0 - mu) ** 2 / jnp.exp(lv))
            ).sum(-1, dtype=jnp.float32)
            lnqzs = lnqzs + log_q_z0 + flow_out["log_abs_det_jac"]
        return lnqzs

    def _sample_from_moe_subset(self, params, data, subset, rng):
        """One random expert per sample (reference ``:271-293``) via one-hot
        gather over the stacked experts."""
        mus, lvs = [], []
        for m in subset:
            out = self.encode_mod(params, m, data[m])
            mus.append(out["embedding"])
            lvs.append(out["log_covariance"])
        mus, lvs = jnp.stack(mus), jnp.stack(lvs)  # (S, B, D)
        rng, c_rng, s_rng = jax.random.split(rng, 3)
        B = mus.shape[1]
        idx = jax.random.randint(c_rng, (B,), 0, len(subset))
        onehot = jax.nn.one_hot(idx, len(subset), dtype=mus.dtype)
        mu = jnp.einsum("bs,sbd->bd", onehot, mus)
        lv = jnp.einsum("bs,sbd->bd", onehot, lvs)
        return rsample_from_gaussian(s_rng, mu, lv)

    def _sample_from_poe_subset(self, params, batch, subset, rng, *,
                                mcmc_steps: int, n_lf: int, eps_lf: float,
                                K: int, divide_prior: bool):
        """Hamiltonian Monte Carlo over the PoE of flow posteriors
        (reference ``:343-436``), as one compiled fori_loop."""
        data = {m: jnp.concatenate([batch.data[m]] * K, axis=0)
                for m in subset}
        n_data = batch.n_samples

        # encoder posterior params are constants of the chain
        enc_params = {}
        for m in subset:
            out = self.encode_mod(params, m, data[m])
            enc_params[m] = (out["embedding"], out["log_covariance"])

        log_density = partial(self._poe_log_density, params,
                              enc_params=enc_params, subset=subset,
                              divide_prior=divide_prior)

        def ld(z):
            return log_density(z)

        grad_ld = jax.grad(lambda z: ld(z).sum())

        rng, init_rng = jax.random.split(rng)
        z0 = self._sample_from_moe_subset(params, data, subset, init_rng)

        def mcmc_body(i, carry):
            z0, rng = carry
            rng, g_rng, a_rng = jax.random.split(rng, 3)
            gamma = jax.random.normal(g_rng, z0.shape)
            rho = gamma

            lnq = ld(z0)
            g = grad_ld(z0)
            H0 = -lnq + 0.5 * jnp.sum(rho**2, axis=-1)

            def leapfrog(_, c):
                z, rho, g = c
                rho_half = rho + (eps_lf / 2) * g
                z_new = z + eps_lf * rho_half
                g_new = grad_ld(z_new)
                rho_new = rho_half + (eps_lf / 2) * g_new
                return z_new, rho_new, g_new

            z, rho, g = jax.lax.fori_loop(0, n_lf, leapfrog, (z0, rho, g))
            H = -ld(z) + 0.5 * jnp.sum(rho**2, axis=-1)
            alpha = jnp.exp(H0 - H)
            accept = (jax.random.uniform(a_rng, (z.shape[0],)) < alpha)
            z_next = jnp.where(accept[:, None], z, z0)
            return (z_next, rng)

        z_final, _ = jax.lax.fori_loop(0, mcmc_steps, mcmc_body, (z0, rng))
        if K == 1:
            return z_final.reshape(n_data, self.latent_dim)
        return z_final.reshape(K, n_data, self.latent_dim)
