"""PolyMNIST benchmark architectures in Flax.

Re-designs of reference ``src/multivae/models/nn/mmnist.py`` (conv encoders
``:36-175``, conv decoder ``:177-207``, resnet encoder/decoder ``:213-366``
adapted there from github.com/epalu/mmvaeplus). Data convention: images are
(B, 3, 28, 28) channels-first at the API boundary (matching the datasets);
the modules transpose to NHWC internally for TPU-native convolutions.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import flax.linen as nn
import jax.numpy as jnp

from ..utils.model_output import ModelOutput
from .default_architectures import BaseAEConfig
from .base_architectures import BaseDecoder, BaseEncoder, BaseMultilatentEncoder
from .torch_init import make_torch_bias_init, torch_conv_kernel_init


def conv(features, kernel, stride, padding, in_features, use_bias=True):
    return nn.Conv(
        features, (kernel, kernel), (stride, stride),
        padding=((padding, padding), (padding, padding)), use_bias=use_bias,
        kernel_init=torch_conv_kernel_init,
        bias_init=make_torch_bias_init(in_features * kernel * kernel),
    )


def deconv(features, kernel, stride, pad_lo, pad_hi, in_features,
           use_bias=True):
    return nn.ConvTranspose(
        features, (kernel, kernel), (stride, stride),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)), use_bias=use_bias,
        kernel_init=torch_conv_kernel_init,
        bias_init=make_torch_bias_init(in_features * kernel * kernel),
    )


def _nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


class EncoderConvMMNIST(BaseEncoder):
    """Conv encoder (3,28,28) -> latent heads (reference ``:36-76``)."""

    args: BaseAEConfig
    bias: bool = False

    @property
    def latent_dim(self):
        return self.args.latent_dim

    @nn.compact
    def __call__(self, x):
        D = self.args.latent_dim
        h = _nchw_to_nhwc(x.reshape(-1, 3, 28, 28))
        h = nn.relu(conv(32, 3, 2, 1, 3)(h))     # -> 14x14x32
        h = nn.relu(conv(64, 3, 2, 1, 32)(h))    # -> 7x7x64
        h = nn.relu(conv(128, 3, 2, 1, 64)(h))   # -> 4x4x128
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(D)(h))
        return ModelOutput(
            embedding=nn.Dense(D, use_bias=self.bias)(h),
            log_covariance=nn.Dense(D, use_bias=self.bias)(h),
        )


class EncoderConvMMNIST_adapted(BaseEncoder):
    """Conv encoder with conv latent heads (reference ``:79-110``)."""

    args: BaseAEConfig

    @property
    def latent_dim(self):
        return self.args.latent_dim

    @nn.compact
    def __call__(self, x):
        D = self.args.latent_dim
        h = _nchw_to_nhwc(x.reshape(-1, 3, 28, 28))
        h = nn.relu(conv(32, 3, 2, 1, 3)(h))
        h = nn.relu(conv(64, 3, 2, 1, 32)(h))
        h = nn.relu(conv(128, 3, 2, 1, 64)(h))
        mu = conv(D, 4, 2, 0, 128)(h)            # -> 1x1xD
        lv = conv(D, 4, 2, 0, 128)(h)
        return ModelOutput(
            embedding=mu.reshape(mu.shape[0], -1),
            log_covariance=lv.reshape(lv.shape[0], -1),
        )


class EncoderConvMMNIST_multilatents(BaseMultilatentEncoder):
    """Conv encoder with separate content/style branches
    (reference ``:113-175``)."""

    args: BaseAEConfig

    @property
    def latent_dim(self):
        return self.args.latent_dim

    @property
    def style_dim(self):
        return self.args.style_dim

    @nn.compact
    def __call__(self, x):
        D, S = self.args.latent_dim, self.args.style_dim
        x = _nchw_to_nhwc(x.reshape(-1, 3, 28, 28))

        def branch(h, name):
            h = nn.relu(conv(32, 3, 2, 1, 3)(h))
            h = nn.relu(conv(64, 3, 2, 1, 32)(h))
            h = nn.relu(conv(128, 3, 2, 1, 64)(h))
            return h

        h_class = branch(x, "class")
        out = ModelOutput(
            embedding=conv(D, 4, 2, 0, 128)(h_class).reshape(x.shape[0], -1),
            log_covariance=conv(D, 4, 2, 0, 128)(h_class).reshape(
                x.shape[0], -1),
        )
        if S > 0:
            h_style = branch(x, "style")
            out["style_embedding"] = conv(S, 4, 2, 0, 128)(h_style).reshape(
                x.shape[0], -1)
            out["style_log_covariance"] = conv(S, 4, 2, 0, 128)(
                h_style).reshape(x.shape[0], -1)
        return out


class DecoderConvMMNIST(BaseDecoder):
    """Conv decoder latent -> (3,28,28) (reference ``:177-207``)."""

    args: BaseAEConfig

    @property
    def latent_dim(self):
        return self.args.latent_dim

    @nn.compact
    def __call__(self, z):
        lead = z.shape[:-1]
        h = z.reshape(-1, z.shape[-1])
        h = nn.relu(nn.Dense(2048)(h))
        h = h.reshape(-1, 128, 4, 4)
        h = _nchw_to_nhwc(h)
        # flax ConvTranspose: out = (in-1)*s + 2 - k + lo + hi
        # torch ConvT(3, s2, p1): 4 -> 7  => lo+hi = 2
        h = nn.relu(deconv(64, 3, 2, 1, 1, 128)(h))
        # torch ConvT(3, s2, p1, op1): 7 -> 14  => lo+hi = 3
        h = nn.relu(deconv(32, 3, 2, 2, 1, 64)(h))
        # 14 -> 28
        h = deconv(3, 3, 2, 2, 1, 32)(h)
        h = _nhwc_to_nchw(h)
        return ModelOutput(reconstruction=h.reshape(*lead, 3, 28, 28))


class ResnetBlock(nn.Module):
    """Residual block (reference ``:214-251``): x_s + 0.1 * conv(x)."""

    nb_channels_in: int
    nb_channels_out: int
    nb_channels_hidden: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        hidden = self.nb_channels_hidden or min(self.nb_channels_in,
                                                self.nb_channels_out)
        dx = nn.leaky_relu(conv(hidden, 3, 1, 1, self.nb_channels_in)(x),
                           negative_slope=0.2)
        dx = nn.leaky_relu(conv(self.nb_channels_out, 3, 1, 1, hidden)(dx),
                           negative_slope=0.2)
        if self.nb_channels_in != self.nb_channels_out:
            x_s = conv(self.nb_channels_out, 1, 1, 0, self.nb_channels_in,
                       use_bias=False)(x)
        else:
            x_s = x
        return x_s + 0.1 * dx


def _upsample_nearest_2x(x):
    """2x nearest-neighbor upsample as reshape+broadcast.

    Bit-identical to ``jax.image.resize(..., method="nearest")`` for an
    exact doubling (both select source row ``i // 2``), but lowers to a
    broadcast instead of a gather — on the flagship MMVAE+ decoder this
    op touches a (M*K*B, 28, 28, 64) ~1.3 GB bf16 activation, where a
    gather pays irregular-access HBM bandwidth three times per step
    (forward, backward, remat recompute)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _avg_pool_3_2_1(x):
    """torch AvgPool2d(3, stride=2, padding=1) (count_include_pad=True)."""
    import jax

    summed = nn.pooling.pool(x, 0.0, jax.lax.add, (3, 3), (2, 2),
                             ((1, 1), (1, 1)))
    return summed / 9.0


class EncoderResnetMMNIST(BaseMultilatentEncoder):
    """Resnet encoder for PolyMNIST (reference ``:254-319``)."""

    private_latent_dim: int
    shared_latent_dim: int
    nf: int = 64
    nf_max: int = 1024
    s0: int = 7

    @property
    def latent_dim(self):
        return self.shared_latent_dim

    @property
    def style_dim(self):
        return self.private_latent_dim

    def _branch(self, x, nlayers):
        h = conv(self.nf, 3, 1, 1, 3)(x)
        h = ResnetBlock(self.nf, self.nf)(h)
        for i in range(nlayers):
            nf0 = min(self.nf * 2**i, self.nf_max)
            nf1 = min(self.nf * 2 ** (i + 1), self.nf_max)
            h = _avg_pool_3_2_1(h)
            h = ResnetBlock(nf0, nf1)(h)
        return h.reshape(h.shape[0], -1)

    @nn.compact
    def __call__(self, x):
        size = 28
        nlayers = int(np.log2(size / self.s0))
        x = _nchw_to_nhwc(x.reshape(-1, 3, 28, 28))

        out_u = self._branch(x, nlayers)
        output = ModelOutput(
            embedding=nn.Dense(self.shared_latent_dim)(out_u),
            log_covariance=nn.Dense(self.shared_latent_dim)(out_u),
        )
        if self.private_latent_dim > 0:
            out_w = self._branch(x, nlayers)
            output["style_embedding"] = nn.Dense(
                self.private_latent_dim)(out_w)
            output["style_log_covariance"] = nn.Dense(
                self.private_latent_dim)(out_w)
        return output


class DecoderResnetMMNIST(BaseDecoder):
    """Resnet decoder for PolyMNIST (reference ``:322-366``)."""

    latent_dim: int
    nf: int = 64
    nf_max: int = 512
    s0: int = 7

    @nn.compact
    def __call__(self, z):
        size = 28
        nlayers = int(np.log2(size / self.s0))
        nf0 = min(self.nf_max, self.nf * 2**nlayers)

        lead = z.shape[:-1]
        h = z.reshape(-1, z.shape[-1])
        h = nn.Dense(nf0 * self.s0 * self.s0)(h)
        h = h.reshape(-1, nf0, self.s0, self.s0)
        h = _nchw_to_nhwc(h)
        for i in range(nlayers):
            c_in = min(self.nf * 2 ** (nlayers - i), self.nf_max)
            c_out = min(self.nf * 2 ** (nlayers - i - 1), self.nf_max)
            h = ResnetBlock(c_in, c_out)(h)
            h = _upsample_nearest_2x(h)
        h = ResnetBlock(self.nf, self.nf)(h)
        h = nn.leaky_relu(conv(3, 3, 1, 1, self.nf)(h), negative_slope=0.2)
        h = _nhwc_to_nchw(h)
        return ModelOutput(reconstruction=h.reshape(*lead, 3, 28, 28))
