"""SVHN benchmark architectures in Flax.

Re-design of reference ``src/multivae/models/nn/svhn.py`` (simple conv
encoder/decoder, fBase=32). Images are (B, C, 32, 32) channels-first at
the API boundary.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..utils.model_output import ModelOutput
from .base_architectures import BaseDecoder, BaseEncoder
from .default_architectures import BaseAEConfig
from .mmnist import _nchw_to_nhwc, _nhwc_to_nchw, conv, deconv


class Encoder_VAE_SVHN(BaseEncoder):
    """Conv encoder for SVHN (reference ``svhn.py:7-38``)."""

    args: BaseAEConfig
    fBase: int = 32

    @property
    def input_dim(self):
        return self.args.input_dim

    @property
    def latent_dim(self):
        return self.args.latent_dim

    @nn.compact
    def __call__(self, x):
        C = self.args.input_dim[0]
        f = self.fBase
        D = self.args.latent_dim
        h = _nchw_to_nhwc(x.reshape(-1, *self.args.input_dim))
        h = nn.relu(conv(f, 4, 2, 1, C)(h))          # -> 16x16
        h = nn.relu(conv(f * 2, 4, 2, 1, f)(h))      # -> 8x8
        h = nn.relu(conv(f * 4, 4, 2, 1, f * 2)(h))  # -> 4x4
        mu = conv(D, 4, 2, 0, f * 4)(h)              # -> 1x1
        lv = conv(D, 4, 2, 0, f * 4)(h)
        return ModelOutput(
            embedding=mu.reshape(mu.shape[0], -1),
            log_covariance=lv.reshape(lv.shape[0], -1),
        )


class Decoder_VAE_SVHN(BaseDecoder):
    """Conv decoder for SVHN (reference ``svhn.py:41-73``)."""

    args: BaseAEConfig
    fBase: int = 32

    @property
    def latent_dim(self):
        return self.args.latent_dim

    @nn.compact
    def __call__(self, z):
        f = self.fBase
        C = self.args.input_dim[0]
        lead = z.shape[:-1]
        h = z.reshape(-1, 1, 1, z.shape[-1])
        # flax ConvTranspose: out = (in-1)*s + 2 - k + lo + hi
        # torch ConvT(4, s1, p0): 1 -> 4  => lo+hi = 6
        h = nn.relu(deconv(f * 4, 4, 1, 3, 3, z.shape[-1])(h))
        # torch ConvT(4, s2, p1): doubles  => lo+hi = 4
        h = nn.relu(deconv(f * 2, 4, 2, 2, 2, f * 4)(h))
        h = nn.relu(deconv(f, 4, 2, 2, 2, f * 2)(h))
        h = nn.sigmoid(deconv(C, 4, 2, 2, 2, f)(h))
        h = _nhwc_to_nchw(h)
        return ModelOutput(
            reconstruction=h.reshape(*lead, *self.args.input_dim)
        )
