"""CVAE: conditional VAE reconstructing one modality from others.

Behavior parity with reference ``src/multivae/models/cvae/cvae_model.py``:
q(z|all data) via a joint encoder; optional prior network p(z|cond mods)
(standard normal otherwise); a conditional decoder reconstructs the main
modality given (z, cond data). Note the reference loss uses the *batch mean*
reduction (``cvae_model.py:167-178``).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Union

import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch, as_batch
from ...nn.base_architectures import (
    BaseConditionalDecoder,
    BaseJointEncoder,
)
from ...nn.default_architectures import (
    BaseAEConfig,
    BaseDictEncoders,
    ConditionalDecoderMLP,
    MultipleHeadJointEncoder,
)
from ...ops.dists import set_decoder_dist
from ...ops.gaussian import kl_divergence, rsample_from_gaussian
from ...utils.host_init import init_on_host
from ...utils.model_output import ModelOutput
from ..base.base_model import BaseModel
from ..base.step import StepInfo
from .cvae_config import CVAEConfig


class CVAE(BaseModel):
    """Conditional Variational Autoencoder."""

    model_name = "CVAE"

    def __init__(self, model_config: CVAEConfig, encoder=None, decoder=None,
                 prior_network=None, seed: int = 0):
        super().__init__(model_config, seed=seed)
        self.latent_dim = model_config.latent_dim
        self.main_modality = model_config.main_modality
        self.conditioning_modalities = list(
            model_config.conditioning_modalities
        )
        self.beta = model_config.beta
        if model_config.decoder_dist_params is None:
            model_config.decoder_dist_params = {}
        self.recon_log_prob = set_decoder_dist(
            model_config.decoder_dist, dict(model_config.decoder_dist_params)
        )

        import flax.linen as nn

        if encoder is None:
            encoder = self._default_encoder(model_config)
        else:
            self.model_config.custom_architectures.append("encoder")
        if not isinstance(encoder, nn.Module):
            raise ValueError("The encoder must be a flax Module implementing "
                             "the BaseJointEncoder contract")
        self.encoder = encoder

        if decoder is None:
            decoder = self._default_decoder(model_config)
        else:
            self.model_config.custom_architectures.append("decoder")
        if not isinstance(decoder, nn.Module):
            raise ValueError("The decoder must be a flax Module implementing "
                             "the BaseConditionalDecoder contract")
        self.decoder = decoder

        if prior_network is None:
            self.prior_network = None
        elif not isinstance(prior_network, nn.Module):
            raise ValueError("The prior network must be a flax Module "
                             "implementing the BaseJointEncoder contract")
        else:
            self.prior_network = prior_network
            self.model_config.custom_architectures.append("prior_network")

        self.init_params()

    # ------------------------------------------------------------- defaults
    def _default_encoder(self, model_config):
        if model_config.input_dims is None:
            raise AttributeError(
                "No encoder was provided but model_config.input_dims is None. "
                "Please provide the input_dims of the model or an encoder "
                "architecture."
            )
        return MultipleHeadJointEncoder(
            dict_encoders=BaseDictEncoders(
                model_config.input_dims, model_config.latent_dim
            ),
            args=BaseAEConfig(latent_dim=model_config.latent_dim),
        )

    def _default_decoder(self, model_config):
        if model_config.input_dims is None:
            raise AttributeError(
                "No decoder was provided but model_config.input_dims is None. "
                "Please provide the input_dims of the model or a decoder "
                "architecture."
            )
        return ConditionalDecoderMLP(
            latent_dim=model_config.latent_dim,
            data_dim=tuple(model_config.input_dims[model_config.main_modality]),
            cond_data_dims={
                m: tuple(model_config.input_dims[m])
                for m in model_config.conditioning_modalities
            },
        )

    # --------------------------------------------------------------- params
    def _dummy_data(self):
        dims = self.model_config.input_dims
        if dims is None:
            raise AttributeError(
                "input_dims are required to initialize CVAE parameters."
            )
        return {m: jnp.zeros((1, *dims[m])) for m in dims}

    @init_on_host
    def init_params(self, rng=None):
        if rng is None:
            rng = self.next_rng()
        k1, k2, k3 = jax.random.split(rng, 3)
        dummy = self._dummy_data()
        cond = {m: dummy[m] for m in self.conditioning_modalities}
        params = {
            "encoder": self.encoder.init(k1, dummy)["params"],
            "decoder": self.decoder.init(
                k2, jnp.zeros((1, self.latent_dim)), cond
            )["params"],
        }
        if self.prior_network is not None:
            params["prior_network"] = self.prior_network.init(k3, cond)[
                "params"]
        self.params = params
        return params

    def _ensure_params(self):
        if self.params is None:
            self.init_params()
        return self.params

    # ----------------------------------------------------------- pure paths
    def _apply_encoder(self, params, data):
        return self.encoder.apply({"params": params["encoder"]}, data)

    def _apply_decoder(self, params, z, cond_data):
        return self.decoder.apply({"params": params["decoder"]}, z, cond_data)

    def _apply_prior(self, params, cond_data):
        return self.prior_network.apply(
            {"params": params["prior_network"]}, cond_data
        )

    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo) -> ModelOutput:
        """Reference ``forward`` (``cvae_model.py:136-180``)."""
        out = self._apply_encoder(params, batch.data)
        mu, log_var = out["embedding"], out["log_covariance"]
        z = rsample_from_gaussian(rng, mu, log_var)

        cond_data = {m: batch.data[m] for m in self.conditioning_modalities}
        if self.prior_network is None:
            prior_mu = jnp.zeros_like(mu)
            prior_lv = jnp.zeros_like(log_var)
        else:
            p = self._apply_prior(params, cond_data)
            prior_mu, prior_lv = p["embedding"], p["log_covariance"]

        recon = self._apply_decoder(params, z, cond_data)["reconstruction"]
        lp = -self.recon_log_prob(recon, batch.data[self.main_modality])
        w = batch.weights
        n_data = jnp.maximum(w.sum(), 1.0)
        # reference: mean over batch then sum over dims (``:167-170``)
        recon_loss = (
            (lp.reshape(lp.shape[0], -1) * w[:, None]).sum() / n_data
        )
        kl = (kl_divergence(mu, log_var, prior_mu, prior_lv) * w).sum() / n_data

        loss = recon_loss + kl * self.beta
        metrics = {"kl": kl, "recon_loss": recon_loss}
        return ModelOutput(loss=loss, loss_sum=loss * n_data, metrics=metrics)

    def forward(self, inputs, epoch: int = 1, rng=None, **kwargs) -> ModelOutput:
        params = self._ensure_params()
        batch = as_batch(inputs)
        if rng is None:
            rng = self.next_rng()
        fn = self._jit(("loss_function",), self.loss_function)
        return fn(params, batch, rng, StepInfo.create(epoch=epoch))

    # ------------------------------------------------------------------ api
    def encode(self, inputs, N: int = 1, return_mean: bool = False,
               flatten: bool = False, rng=None, **kwargs) -> ModelOutput:
        """Reference ``encode`` (``cvae_model.py:182-228``)."""
        params = self._ensure_params()
        batch = as_batch(inputs)
        if rng is None:
            rng = self.next_rng()
        key = ("encode", N, bool(return_mean), bool(flatten))
        fn = self._jit(key, partial(self._encode, N=N,
                                    return_mean=bool(return_mean),
                                    flatten=bool(flatten)))
        z, cond = fn(params, batch, rng)
        return ModelOutput(z=z, cond_mod_data=cond)

    def _tile_cond(self, batch, N, flatten):
        cond = {m: batch.data[m] for m in self.conditioning_modalities}
        if N > 1 and not flatten:
            cond = {m: jnp.broadcast_to(v, (N, *v.shape))
                    for m, v in cond.items()}
        elif N > 1 and flatten:
            cond = {m: jnp.concatenate([v] * N, axis=0)
                    for m, v in cond.items()}
        return cond

    def _encode(self, params, batch, rng, *, N, return_mean, flatten):
        out = self._apply_encoder(params, batch.data)
        mu, lv = out["embedding"], out["log_covariance"]
        z = rsample_from_gaussian(rng, mu, lv, N=N, return_mean=return_mean,
                                  flatten=flatten)
        return z, self._tile_cond(batch, N, flatten)

    def decode(self, embedding: ModelOutput, **kwargs) -> ModelOutput:
        """Reference ``decode`` (``cvae_model.py:230-261``)."""
        params = self._ensure_params()
        z = embedding["z"]
        cond = embedding["cond_mod_data"]
        if z.ndim == 3:
            N, B, D = z.shape
            flat_z = z.reshape(N * B, D)
            flat_cond = {m: v.reshape(N * B, *v.shape[2:])
                         for m, v in cond.items()}
            out = self._apply_decoder(params, flat_z, flat_cond)
            recon = out["reconstruction"]
            return ModelOutput(
                reconstruction=recon.reshape(N, B, *recon.shape[1:])
            )
        out = self._apply_decoder(params, z, cond)
        return ModelOutput(reconstruction=out["reconstruction"])

    def generate_from_prior(self, cond_mod_data: Dict, N: int = 1,
                            flatten: bool = False, rng=None, **kwargs):
        """Reference ``generate_from_prior`` (``cvae_model.py:264-312``)."""
        params = self._ensure_params()
        if rng is None:
            rng = self.next_rng()
        cond_mod_data = {m: jnp.asarray(v) for m, v in cond_mod_data.items()}
        batch_size = next(iter(cond_mod_data.values())).shape[0]
        if self.prior_network is None:
            prior_mu = jnp.zeros((batch_size, self.latent_dim))
            prior_lv = jnp.zeros((batch_size, self.latent_dim))
        else:
            p = self._apply_prior(params, cond_mod_data)
            prior_mu, prior_lv = p["embedding"], p["log_covariance"]
        z = rsample_from_gaussian(rng, prior_mu, prior_lv, N=N,
                                  flatten=flatten)
        if N > 1 and not flatten:
            cond = {m: jnp.broadcast_to(v, (N, *v.shape))
                    for m, v in cond_mod_data.items()}
        elif N > 1 and flatten:
            cond = {m: jnp.concatenate([v] * N, axis=0)
                    for m, v in cond_mod_data.items()}
        else:
            cond = dict(cond_mod_data)
        return ModelOutput(z=z, cond_mod_data=cond)

    def predict(self, inputs, cond_mod: Union[str, list] = "all", N: int = 1,
                rng=None, **kwargs) -> ModelOutput:
        """Reference ``predict`` (``cvae_model.py:314-362``)."""
        batch = as_batch(inputs)
        if (cond_mod == "all"
                or set(cond_mod) == {self.main_modality}
                or set(cond_mod) == set([self.main_modality]
                                        + self.conditioning_modalities)):
            embeddings = self.encode(batch, N=N, rng=rng, **kwargs)
        elif set(cond_mod) == set(self.conditioning_modalities):
            cond_data = {m: batch.data[m]
                         for m in self.conditioning_modalities}
            embeddings = self.generate_from_prior(cond_data, N=N, rng=rng,
                                                  **kwargs)
        else:
            raise ValueError(
                "The conditioning modalities must be either 'all' or the "
                "list of conditioning modalities"
            )
        decoded = self.decode(embeddings)
        output = ModelOutput()
        output[self.main_modality] = decoded["reconstruction"]
        return output
