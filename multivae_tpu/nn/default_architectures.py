"""Default MLP architectures for all models.

Re-designs of reference ``src/multivae/models/nn/default_architectures.py``
as Flax modules. Structure parity (widths/activations/output heads) is kept
so default-config models behave like the reference:

- ``Encoder_VAE_MLP``: flatten -> [512 ReLU] x (1+n_hidden) -> (mu, log_var)
  heads (reference ``default_architectures.py:21-72``).
- ``Decoder_AE_MLP``: z -> 512 ReLU -> prod(input_dim) sigmoid -> reshape
  (reference ``default_architectures.py:225-258``); accepts any leading
  shape (*, latent_dim).
- ``Encoder_VAE_MLP_Style``: extra style heads
  (``default_architectures.py:75-141``).
- ``MultipleHeadJointEncoder``: fresh copies of the unimodal encoders +
  fusion MLP (``default_architectures.py:261-322``).
- ``ConditionalDecoderMLP`` (``default_architectures.py:325-347``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import flax.linen as nn
import jax.numpy as jnp
import pydantic

from ..utils.config import BaseConfig
from ..utils.model_output import ModelOutput
from .base_architectures import (
    BaseConditionalDecoder,
    BaseDecoder,
    BaseEncoder,
    BaseJointEncoder,
    BaseMultilatentEncoder,
)
from .torch_init import dense


@pydantic.dataclasses.dataclass
class BaseAEConfig(BaseConfig):
    """Config for encoder/decoder nets (reference ``base_config.py:51-64``).

    Args:
        input_dim: the input data dimension (channels, x, y) or (D,).
        latent_dim: latent space dimension.
        style_dim: private latent dimension (multi-latent models).
    """

    input_dim: Optional[Tuple[int, ...]] = None
    latent_dim: int = 10
    style_dim: int = 0


class Encoder_VAE_MLP(BaseEncoder):
    """Simple MLP encoder with Gaussian posterior heads."""

    args: BaseAEConfig
    n_hidden: int = 1
    hidden_dim: int = 512

    @property
    def input_dim(self):
        return self.args.input_dim

    @property
    def latent_dim(self):
        return self.args.latent_dim

    @nn.compact
    def __call__(self, x):
        in_features = int(np.prod(self.args.input_dim))
        out = x.reshape(-1, in_features)
        out = nn.relu(dense(self.hidden_dim, in_features)(out))
        for _ in range(self.n_hidden):
            out = nn.relu(dense(self.hidden_dim, self.hidden_dim)(out))
        embedding = dense(self.args.latent_dim, self.hidden_dim)(out)
        log_covariance = dense(self.args.latent_dim, self.hidden_dim)(out)
        return ModelOutput(embedding=embedding, log_covariance=log_covariance)


class Encoder_VAE_MLP_Style(BaseMultilatentEncoder):
    """MLP encoder with shared + style Gaussian heads."""

    args: BaseAEConfig
    hidden_dim: int = 512

    @property
    def input_dim(self):
        return self.args.input_dim

    @property
    def latent_dim(self):
        return self.args.latent_dim

    @property
    def style_dim(self):
        return self.args.style_dim

    @nn.compact
    def __call__(self, x):
        in_features = int(np.prod(self.args.input_dim))
        out = x.reshape(-1, in_features)
        out = nn.relu(dense(self.hidden_dim, in_features)(out))
        return ModelOutput(
            embedding=dense(self.args.latent_dim, self.hidden_dim)(out),
            log_covariance=dense(self.args.latent_dim, self.hidden_dim)(out),
            style_embedding=dense(self.args.style_dim, self.hidden_dim)(out),
            style_log_covariance=dense(self.args.style_dim, self.hidden_dim)(out),
        )


class Decoder_AE_MLP(BaseDecoder):
    """MLP decoder; accepts any leading shape (*, latent_dim)."""

    args: BaseAEConfig
    hidden_dim: int = 512

    @property
    def input_dim(self):
        return self.args.input_dim

    @property
    def latent_dim(self):
        return self.args.latent_dim

    @nn.compact
    def __call__(self, z):
        out_features = int(np.prod(self.args.input_dim))
        out = nn.relu(dense(self.hidden_dim, self.args.latent_dim)(z))
        out = nn.sigmoid(dense(out_features, self.hidden_dim)(out))
        output_shape = (*z.shape[:-1], *self.args.input_dim)
        return ModelOutput(reconstruction=out.reshape(output_shape))


def BaseDictEncoders(input_dims: dict, latent_dim: int) -> Dict[str, BaseEncoder]:
    """Default MLP encoder per modality (reference ``:143-159``)."""
    return {
        mod: Encoder_VAE_MLP(
            BaseAEConfig(input_dim=tuple(input_dims[mod]), latent_dim=latent_dim)
        )
        for mod in input_dims
    }


def BaseDictEncoders_MultiLatents(
    input_dims: dict, latent_dim: int, modality_dims: dict
) -> Dict[str, BaseMultilatentEncoder]:
    """Default multi-latent MLP encoder per modality (reference ``:161-186``)."""
    return {
        mod: Encoder_VAE_MLP_Style(
            BaseAEConfig(
                input_dim=tuple(input_dims[mod]),
                latent_dim=latent_dim,
                style_dim=modality_dims[mod],
            )
        )
        for mod in input_dims
    }


def BaseDictDecoders(input_dims: dict, latent_dim: int) -> Dict[str, BaseDecoder]:
    """Default MLP decoder per modality (reference ``:189-203``)."""
    return {
        mod: Decoder_AE_MLP(
            BaseAEConfig(input_dim=tuple(input_dims[mod]), latent_dim=latent_dim)
        )
        for mod in input_dims
    }


def BaseDictDecodersMultiLatents(
    input_dims: dict, latent_dim: int, modality_dims: dict
) -> Dict[str, BaseDecoder]:
    """Decoders taking concat(shared z, private z) (reference ``:206-222``)."""
    return {
        mod: Decoder_AE_MLP(
            BaseAEConfig(
                input_dim=tuple(input_dims[mod]),
                latent_dim=latent_dim + modality_dims[mod],
            )
        )
        for mod in input_dims
    }


class MultipleHeadJointEncoder(BaseJointEncoder):
    """Joint encoder: fresh copies of unimodal encoders + fusion MLP.

    The reference deepcopies the unimodal encoders
    (``default_architectures.py:261-322``); in Flax, declaring the same
    module classes creates independent parameters, which is the equivalent.
    """

    dict_encoders: Dict[str, BaseEncoder]
    args: BaseAEConfig
    hidden_dim: int = 512
    n_hidden_layers: int = 2

    @property
    def latent_dim(self):
        return self.args.latent_dim

    @nn.compact
    def __call__(self, x: Dict[str, jnp.ndarray]):
        outputs = []
        joint_input_dim = 0
        for mod in self.dict_encoders:
            outputs.append(self.dict_encoders[mod](x[mod])["embedding"])
            joint_input_dim += outputs[-1].shape[-1]

        h = jnp.concatenate(outputs, axis=-1)
        h = nn.relu(dense(self.hidden_dim, joint_input_dim)(h))
        for _ in range(self.n_hidden_layers - 1):
            h = nn.relu(dense(self.hidden_dim, self.hidden_dim)(h))
        return ModelOutput(
            embedding=dense(self.args.latent_dim, self.hidden_dim)(h),
            log_covariance=dense(self.args.latent_dim, self.hidden_dim)(h),
        )


class ConditionalDecoderMLP(BaseConditionalDecoder):
    """MLP decoder conditioned on other modalities' raw data.

    Reference: ``default_architectures.py:325-347``.
    """

    latent_dim: int
    cond_data_dims: Dict[str, tuple]
    data_dim: tuple

    @nn.compact
    def __call__(self, z, cond_mods: Dict[str, jnp.ndarray]):
        all_dim = self.latent_dim + sum(
            int(np.prod(d)) for d in self.cond_data_dims.values()
        )
        parts = [z] + [
            cond_mods[k].reshape(z.shape[0], -1) for k in self.cond_data_dims
        ]
        h = jnp.concatenate(parts, axis=-1)
        network = Decoder_AE_MLP(
            BaseAEConfig(input_dim=tuple(self.data_dim), latent_dim=all_dim)
        )
        return network(h)
