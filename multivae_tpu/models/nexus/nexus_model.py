"""Nexus: two-level hierarchical multimodal VAE, TPU-native.

Behavior parity with reference ``src/multivae/models/nexus/nexus_model.py``:
per-modality bottom VAEs; detached bottom codes -> top "message" encoders ->
mean aggregation -> top joint VAE reconstructing the bottom codes. KL terms
annealed over ``warmup``; per-modality gammas / bottom betas.

TPU redesign: the reference's *per-sample Python loop* for forced
perceptual dropout (``nexus_model.py:231-247``) becomes a vectorized
random-top-k mask: per-sample Bernoulli drop + per-sample random subset via
argsorted uniform scores, all inside the compiled program.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch
from ...nn.default_architectures import (
    BaseAEConfig,
    Decoder_AE_MLP,
    Encoder_VAE_MLP,
)
from ...ops.gaussian import gaussian_log_prob, rsample_from_gaussian
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import BaseMultiVAE, sum_except_batch
from ..base.step import StepInfo
from .nexus_config import NexusConfig


class Nexus(BaseMultiVAE):
    """The Nexus model."""

    model_name = "NEXUS"

    def __init__(self, model_config: NexusConfig, encoders: dict = None,
                 decoders: dict = None, top_encoders: dict = None,
                 joint_encoder=None, top_decoders: dict = None,
                 seed: int = 0, **kwargs):
        super().__init__(model_config, encoders, decoders, seed=seed)

        self._set_top_decoders(top_decoders, model_config)
        self._set_top_encoders(top_encoders, model_config)
        self._set_joint_encoder(joint_encoder, model_config)

        self._set_bottom_betas(model_config.bottom_betas)
        self._set_gammas(model_config.gammas)
        self.start_keep_best_epoch = model_config.warmup + 1
        self.adapt_top_decoder_variance = self._set_top_decoder_variance(
            model_config
        )
        self.check_aggregator(model_config)
        self.init_params()

    # ------------------------------------------------------------- networks
    def default_encoders(self, model_config):
        if (model_config.input_dims is None
                or model_config.modalities_specific_dim is None):
            raise AttributeError(
                "Please provide encoders architectures or valid input_dims "
                "and modalities_specific_dim in the model configuration"
            )
        return {
            m: Encoder_VAE_MLP(BaseAEConfig(
                input_dim=tuple(model_config.input_dims[m]),
                latent_dim=model_config.modalities_specific_dim[m],
            ))
            for m in model_config.input_dims
        }

    def default_decoders(self, model_config):
        if (model_config.input_dims is None
                or model_config.modalities_specific_dim is None):
            raise AttributeError(
                "Please provide decoders architectures or valid input_dims "
                "and modalities_specific_dim in the model configuration"
            )
        return {
            m: Decoder_AE_MLP(BaseAEConfig(
                input_dim=tuple(model_config.input_dims[m]),
                latent_dim=model_config.modalities_specific_dim[m],
            ))
            for m in model_config.input_dims
        }

    def _default_top_encoders(self, model_config):
        if model_config.modalities_specific_dim is None:
            raise AttributeError(
                "Please provide top_encoders architectures or valid "
                "modalities_specific_dim in the model configuration"
            )
        return {
            m: Encoder_VAE_MLP(BaseAEConfig(
                input_dim=(model_config.modalities_specific_dim[m],),
                latent_dim=model_config.msg_dim,
            ))
            for m in model_config.input_dims
        }

    def _default_top_decoders(self, model_config):
        if model_config.modalities_specific_dim is None:
            raise AttributeError(
                "Please provide top_decoders architectures or valid "
                "modalities_specific_dim in the model configuration"
            )
        return {
            m: Decoder_AE_MLP(BaseAEConfig(
                input_dim=(model_config.modalities_specific_dim[m],),
                latent_dim=model_config.latent_dim,
            ))
            for m in model_config.input_dims
        }

    def _default_joint_encoder(self, model_config):
        return Encoder_VAE_MLP(BaseAEConfig(
            input_dim=(model_config.msg_dim,),
            latent_dim=model_config.latent_dim,
        ))

    def _set_top_encoders(self, top_encoders, model_config):
        import flax.linen as nn

        if top_encoders is None:
            top_encoders = self._default_top_encoders(model_config)
        else:
            self.model_config.custom_architectures.append("top_encoders")
        for k, v in top_encoders.items():
            if not isinstance(v, nn.Module):
                raise AttributeError(
                    "Top encoders must be flax encoder modules"
                )
        self.top_encoders = dict(top_encoders)

    def _set_top_decoders(self, top_decoders, model_config):
        import flax.linen as nn

        if top_decoders is None:
            top_decoders = self._default_top_decoders(model_config)
        else:
            self.model_config.custom_architectures.append("top_decoders")
        for k, v in top_decoders.items():
            if not isinstance(v, nn.Module):
                raise AttributeError(
                    "Top decoders must be flax decoder modules"
                )
        self.top_decoders = dict(top_decoders)

    def _set_joint_encoder(self, joint_encoder, model_config):
        import flax.linen as nn

        if joint_encoder is None:
            joint_encoder = self._default_joint_encoder(model_config)
        else:
            self.model_config.custom_architectures.append("joint_encoder")
        if not isinstance(joint_encoder, nn.Module):
            raise AttributeError(
                "Joint encoder must be a flax encoder module"
            )
        self.joint_encoder = joint_encoder

    def _set_bottom_betas(self, bottom_betas):
        if bottom_betas is None:
            bottom_betas = {m: 1.0 for m in self.encoders}
        if bottom_betas.keys() != self.encoders.keys():
            raise AttributeError(
                "The bottom_betas keys do not match the modalities names in "
                "encoders."
            )
        self.bottom_betas = dict(bottom_betas)

    def _set_gammas(self, gammas):
        if gammas is None:
            gammas = {m: 1.0 for m in self.encoders}
        elif gammas.keys() != self.encoders.keys():
            raise AttributeError(
                "The gammas keys do not match the modalities names in "
                "encoders."
            )
        self.gammas = dict(gammas)

    def _set_top_decoder_variance(self, config):
        if config.adapt_top_decoder_variance is None:
            return []
        for m in config.adapt_top_decoder_variance:
            if m not in self.modalities_name:
                raise AttributeError(
                    "A string provided in *adapt_top_decoder_variance* "
                    f"doesn't match any of the modalities name: {m} is not "
                    f"in {self.modalities_name}"
                )
        return list(config.adapt_top_decoder_variance)

    def check_aggregator(self, config):
        if config.aggregator not in ["mean"]:
            raise AttributeError(
                f"This aggregator {config.aggregator} is not supported at "
                "the moment"
            )

    def _decoder_input_dim(self, mod: str) -> int:
        return self.model_config.modalities_specific_dim[mod]

    def _init_extra_modules(self, rng) -> dict:
        rngs = jax.random.split(rng, 2 * len(self.encoders) + 1)
        specific = self.model_config.modalities_specific_dim
        top_enc = {}
        top_dec = {}
        for i, m in enumerate(self.encoders):
            top_enc[m] = self.top_encoders[m].init(
                rngs[2 * i], jnp.zeros((1, specific[m]))
            )["params"]
            top_dec[m] = self.top_decoders[m].init(
                rngs[2 * i + 1], jnp.zeros((1, self.latent_dim))
            )["params"]
        joint = self.joint_encoder.init(
            rngs[-1], jnp.zeros((1, self.model_config.msg_dim))
        )["params"]
        return {"top_encoders": top_enc, "top_decoders": top_dec,
                "joint_encoder": joint}

    # ------------------------------------------------------------ pure apply
    def _apply_top_encoder(self, params, mod, z):
        return self.top_encoders[mod].apply(
            {"params": params["top_encoders"][mod]}, z
        )

    def _apply_top_decoder(self, params, mod, z):
        return self.top_decoders[mod].apply(
            {"params": params["top_decoders"][mod]}, z
        )["reconstruction"]

    def _apply_joint_encoder(self, params, msg):
        return self.joint_encoder.apply(
            {"params": params["joint_encoder"]}, msg
        )

    # ----------------------------------------------------------------- loss
    def _compute_bottom_elbos(self, params, batch, rng, annealing):
        """Reference ``_compute_bottom_elbos`` (``nexus_model.py:80-132``)."""
        modalities_msg = {}
        first_level_z = {}
        bottom_loss = 0.0
        metrics = {}
        rngs = jax.random.split(rng, len(self.encoders))
        for i, m in enumerate(self.encoders):
            out = self.encode_mod(params, m, batch.data[m])
            mu, lv = out["embedding"], out["log_covariance"]
            z_m = rsample_from_gaussian(rngs[i], mu, lv)
            recon = self.decode_mod(params, m, z_m)
            nlogprob = sum_except_batch(
                -self.recon_log_probs[m](recon, batch.data[m])
                * self.rescale_factors[m]
            )
            kld = -0.5 * jnp.sum(1.0 + lv - mu**2 - jnp.exp(lv), axis=-1, dtype=jnp.float32)
            m_elbo = nlogprob + kld * self.bottom_betas[m] * annealing

            z_detached = jax.lax.stop_gradient(z_m)
            first_level_z[m] = z_detached
            modalities_msg[m] = self._apply_top_encoder(
                params, m, z_detached
            )["embedding"]
            metrics["recon_loss_" + m] = nlogprob.mean()
            metrics["kl_" + m] = kld.mean()
            m_elbo = m_elbo * batch.masks[m]
            bottom_loss = bottom_loss + m_elbo
        return bottom_loss, modalities_msg, first_level_z, metrics

    def _aggregate_during_training(self, params, batch, modalities_msg, rng):
        """Mean aggregation with mask weighting / forced perceptual dropout.

        Reference ``_aggregate_during_training`` (``nexus_model.py:209-254``);
        the per-sample dropout loop is vectorized with a random-top-k mask.
        """
        msgs = jnp.stack(list(modalities_msg.values()), axis=0)  # (M, B, d)
        M = msgs.shape[0]
        if batch.incomplete:
            mask = jnp.stack([batch.masks[m] for m in modalities_msg])
            norm = jnp.maximum(mask.sum(0), 1.0)
            agg = (msgs * mask[..., None]).sum(0) / norm[:, None]
            return agg

        B = msgs.shape[1]
        rng, b_rng, s_rng, p_rng = jax.random.split(rng, 4)
        drop = jax.random.bernoulli(
            b_rng, self.model_config.dropout_rate, (B,)
        )
        # per-sample random subset: keep the modalities whose random score
        # ranks below subset_size (uniform in [1, M-1])
        subset_size = jax.random.randint(s_rng, (B,), 1, max(M, 2))
        scores = jax.random.uniform(p_rng, (M, B))
        ranks = jnp.argsort(jnp.argsort(scores, axis=0), axis=0)
        keep = (ranks < subset_size[None, :]).astype(msgs.dtype)
        keep = jnp.where(drop[None, :], keep, jnp.ones_like(keep))
        agg = (msgs * keep[..., None]).sum(0) / keep.sum(0)[:, None]
        return agg

    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo) -> ModelOutput:
        """Reference ``forward`` (``nexus_model.py:134-207``)."""
        annealing = jnp.minimum(
            step.epoch / max(self.model_config.warmup, 1), 1.0
        )
        rng, b_rng, a_rng, j_rng = jax.random.split(rng, 4)
        bottom_loss, modalities_msg, first_level_z, metrics = (
            self._compute_bottom_elbos(params, batch, b_rng, annealing)
        )
        aggregated_msg = self._aggregate_during_training(
            params, batch, modalities_msg, a_rng
        )
        joint = self._apply_joint_encoder(params, aggregated_msg)
        j_mu, j_lv = joint["embedding"], joint["log_covariance"]
        joint_z = rsample_from_gaussian(j_rng, j_mu, j_lv)

        z_recon_loss = 0.0
        for m in self.top_decoders:
            z_m_recon = self._apply_top_decoder(params, m, joint_z)
            if m in self.adapt_top_decoder_variance:
                scale = jnp.sqrt(jnp.mean(
                    (first_level_z[m] - z_m_recon) ** 2, axis=(0, 1),
                    keepdims=True,
                ))
                log_var = 2.0 * jnp.log(jnp.maximum(scale, 1e-12))
            else:
                log_var = jnp.zeros((1, 1))
            lp = gaussian_log_prob(
                first_level_z[m], z_m_recon,
                jnp.broadcast_to(log_var, z_m_recon.shape),
            )
            z_m_loss = -lp.sum(-1, dtype=jnp.float32) * self.gammas[m]
            z_m_loss = z_m_loss * batch.masks[m]
            z_recon_loss = z_recon_loss + z_m_loss
            metrics["recon_z_" + m] = z_m_loss.mean()

        joint_kld = -0.5 * jnp.sum(
            1.0 + j_lv - j_mu**2 - jnp.exp(j_lv), axis=-1, dtype=jnp.float32
        )
        top_loss = z_recon_loss + self.model_config.top_beta * joint_kld \
            * annealing
        total = (top_loss + bottom_loss) * batch.weights
        n_data = jnp.maximum(batch.weights.sum(), 1.0)

        metrics.update({
            "annealing": annealing,
            "bottom_loss": bottom_loss.mean(),
            "top_loss": top_loss.mean(),
            "joint_KLD": joint_kld.mean(),
        })
        return ModelOutput(loss=total.sum() / n_data, loss_sum=total.sum(),
                           metrics=metrics)

    # --------------------------------------------------------------- encode
    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool) -> dict:
        """Reference ``encode`` (``nexus_model.py:256-317``)."""
        modalities_z = {}
        msgs = []
        rng, z_rng = jax.random.split(rng)
        mod_rngs = jax.random.split(rng, len(cond_mod))
        for i, m in enumerate(cond_mod):
            out = self.encode_mod(params, m, batch.data[m])
            z_m = rsample_from_gaussian(
                mod_rngs[i], out["embedding"], out["log_covariance"], N=N,
                return_mean=return_mean, flatten=True,
            )
            modalities_z[m] = z_m
            msgs.append(self._apply_top_encoder(params, m, z_m)["embedding"])

        aggregated = jnp.stack(msgs, axis=0).mean(0)
        nexus_out = self._apply_joint_encoder(params, aggregated)
        z = rsample_from_gaussian(
            z_rng, nexus_out["embedding"], nexus_out["log_covariance"], N=1,
            return_mean=return_mean,
        )
        if N > 1 and not flatten:
            z = z.reshape(N, -1, *z.shape[1:])
            modalities_z = {
                m: v.reshape(N, -1, *v.shape[1:])
                for m, v in modalities_z.items()
            }
        return {"z": z, "modalities_z": modalities_z}

    def decode(self, embedding: ModelOutput,
               modalities: Union[list, str] = "all",
               use_bottom_z_for_recon: bool = True) -> ModelOutput:
        """Reference ``decode`` (``nexus_model.py:318-365``): cross-modal
        generation goes through the top decoders; self-reconstruction can
        reuse the bottom codes."""
        params = self._ensure_params()
        if modalities == "all":
            mods = tuple(self.encoders.keys())
        elif isinstance(modalities, str):
            mods = (modalities,)
        else:
            mods = tuple(modalities)

        if "modalities_z" not in embedding:
            use_bottom_z_for_recon = False

        z = embedding["z"]
        reshape = z.ndim == 3
        if reshape:
            N, bs = z.shape[:2]

        outputs = ModelOutput()
        for m in mods:
            if use_bottom_z_for_recon and m in embedding["modalities_z"]:
                z_m = embedding["modalities_z"][m]
                if reshape:
                    z_m = z_m.reshape(N * bs, -1)
            else:
                zz = z.reshape(N * bs, -1) if reshape else z
                z_m = self._apply_top_decoder(params, m, zz)
            recon = self.decode_mod(params, m, z_m)
            if reshape:
                recon = recon.reshape(N, bs, *recon.shape[1:])
            outputs[m] = recon
        return outputs
