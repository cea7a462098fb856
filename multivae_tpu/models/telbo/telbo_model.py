"""TELBO: Triple-ELBO two-stage joint model, TPU-native.

Behavior parity with reference ``src/multivae/models/telbo/telbo_model.py``:
stage 1 (epoch <= warmup) trains the joint ELBO; stage 2 freezes the joint
encoder + decoders and trains unimodal ELBOs. ``reset_optimizer_epochs =
[warmup]`` so the MultistageTrainer resets the optimizer at the boundary.

TPU design: the stage is a *static* attribute (``current_stage``) set by
the trainer from the epoch (``stage_for_epoch``); each stage compiles its
own program, and stage-2 freezing is ``stop_gradient`` on the frozen param
subtrees (zero grads => zero optax updates, equivalent to the reference's
``requires_grad_(False)``).

Reference quirk kept for parity: stage 2's KL term uses the *joint*
encoder's log_var in the ``1 + log_var`` summand (``telbo_model.py:117``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch
from ...ops.gaussian import rsample_from_gaussian
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import sum_except_batch
from ..base.step import StepInfo
from ..joint_models.joint_model import BaseJointModel
from .telbo_config import TELBOConfig


class TELBO(BaseJointModel):
    """The Triple ELBO model (needs the MultistageTrainer)."""

    model_name = "TELBO"

    def __init__(self, model_config: TELBOConfig, encoders: dict = None,
                 decoders: dict = None, joint_encoder=None, seed: int = 0,
                 **kwargs):
        super().__init__(model_config, encoders, decoders, joint_encoder,
                         seed=seed, **kwargs)
        self.warmup = model_config.warmup
        self.reset_optimizer_epochs = [self.warmup]
        self.current_stage = 1

        if model_config.lambda_factors is None:
            self.lambda_factors = dict(self.rescale_factors)
        else:
            self.lambda_factors = dict(model_config.lambda_factors)
        if model_config.gamma_factors is None:
            self.gamma_factors = dict(self.rescale_factors)
        else:
            self.gamma_factors = dict(model_config.gamma_factors)
        self.init_params()

    # -------------------------------------------------------------- staging
    def stage_for_epoch(self, epoch: int) -> int:
        return 1 if epoch <= self.warmup else 2

    def set_stage(self, stage: int) -> bool:
        """Returns True if the stage changed (compiled fns must be rebuilt)."""
        if stage != self.current_stage:
            self.current_stage = stage
            self._jit_cache.clear()
            return True
        return False

    # ----------------------------------------------------------------- loss
    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo) -> ModelOutput:
        """Reference ``forward`` (``telbo_model.py:65-127``)."""
        w = batch.weights
        n_data = jnp.maximum(w.sum(), 1.0)

        joint = self.apply_joint_encoder(params, batch.data)
        mu, log_var = joint["embedding"], joint["log_covariance"]

        if self.current_stage == 1:
            z_joint = rsample_from_gaussian(rng, mu, log_var)
            recon_loss = 0.0
            for mod in self.decoders:
                recon = self.decode_mod(params, mod, z_joint)
                rec = sum_except_batch(
                    -self.recon_log_probs[mod](recon, batch.data[mod])
                    * self.lambda_factors[mod]
                )
                recon_loss = recon_loss + (rec * w).sum()
            kld = -0.5 * jnp.sum(
                (1.0 + log_var - mu**2 - jnp.exp(log_var)).sum(
                    -1, dtype=jnp.float32) * w
            )
            loss_sum = recon_loss + kld
            return ModelOutput(
                loss=loss_sum / n_data, loss_sum=loss_sum,
                recon_loss=recon_loss / n_data, KLD=kld / n_data,
                metrics={"kld_joint": kld, "recon_joint": recon_loss / n_data},
            )

        # ---- stage 2: freeze joint encoder + decoders (reference :58-63)
        frozen = dict(params)
        frozen["joint_encoder"] = jax.lax.stop_gradient(
            params["joint_encoder"]
        )
        frozen["decoders"] = jax.lax.stop_gradient(params["decoders"])
        joint = self.apply_joint_encoder(frozen, batch.data)
        log_var = joint["log_covariance"]

        rngs = jax.random.split(rng, len(self.encoders))
        loss = 0.0
        metrics = {}
        for i, mod in enumerate(self.encoders):
            out = self.encode_mod(frozen, mod, batch.data[mod])
            mod_mu, mod_lv = out["embedding"], out["log_covariance"]
            mod_z = rsample_from_gaussian(rngs[i], mod_mu, mod_lv)
            mod_recon = self.decode_mod(frozen, mod, mod_z)
            mod_rec = sum_except_batch(
                -self.recon_log_probs[mod](mod_recon, batch.data[mod])
                * self.gamma_factors[mod]
            )
            # reference quirk: uses the JOINT log_var in the first summand
            mod_kld = -0.5 * jnp.sum(
                (1.0 + log_var - mod_mu**2 - jnp.exp(mod_lv)).sum(
                    -1, dtype=jnp.float32) * w
            )
            mod_elbo = (mod_rec * w).sum() + mod_kld
            metrics[mod] = mod_elbo
            loss = loss + mod_elbo

        return ModelOutput(loss=loss / n_data, loss_sum=loss, metrics=metrics)

    # --------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool) -> dict:
        """Reference ``encode`` (``telbo_model.py:129-174``): only single
        modalities or the full set are supported."""
        if len(cond_mod) == 1:
            out = self.encode_mod(params, cond_mod[0], batch.data[cond_mod[0]])
        elif len(cond_mod) == self.n_modalities:
            out = self.apply_joint_encoder(params, batch.data)
        else:
            raise ValueError(
                f"Conditioning on subset {list(cond_mod)} is not handled. "
                f"Possible subsets are {list(self.encoders.keys())} and 'all'."
            )
        z = rsample_from_gaussian(
            rng, out["embedding"], out["log_covariance"], N=N,
            return_mean=return_mean, flatten=flatten,
        )
        return {"z": z}

    def _normalize_cond_mod(self, cond_mod):
        cond = super()._normalize_cond_mod(cond_mod)
        if len(cond) not in (1, self.n_modalities):
            raise ValueError(
                f"Conditioning on subset {list(cond)} is not handled. "
                f"Possible subsets are {list(self.encoders.keys())} and 'all'."
            )
        return cond
