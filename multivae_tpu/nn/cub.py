"""CUB benchmark architectures in Flax: transformer text enc + resnet image.

Re-designs of reference ``src/multivae/models/nn/cub.py``: transformer text
encoder with positional encoding (``cub.py:16-105``), MLP text decoder
(``:107-140``), pre-activation resnet image encoder/decoder for 64x64
images (``:144-290``). Text inputs are dicts {'tokens': (B, L) int,
'padding_mask': (B, L) 1=valid}; images are (B, 3, 64, 64) channels-first.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.model_output import ModelOutput
from .base_architectures import BaseDecoder, BaseEncoder
from .default_architectures import BaseAEConfig, Decoder_AE_MLP
from .mmnist import (
    _avg_pool_3_2_1,
    _nchw_to_nhwc,
    _nhwc_to_nchw,
    _upsample_nearest_2x,
    conv,
)


def positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Sinusoidal positional encodings (reference ``cub.py:16-37``)."""
    position = np.arange(max_len)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0)
                                                  / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (torch default semantics)."""

    embed_size: int
    nhead: int
    ff_size: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, padding_mask, deterministic: bool = True):
        attn_mask = padding_mask[:, None, None, :] > 0  # (B, 1, 1, L)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.embed_size,
            deterministic=deterministic, dropout_rate=self.dropout,
        )(x, x, mask=attn_mask)
        x = nn.LayerNorm()(x + attn)
        ff = nn.Dense(self.ff_size)(x)
        ff = nn.relu(ff)
        ff = nn.Dense(self.embed_size)(ff)
        return nn.LayerNorm()(x + ff)


class CubTextEncoder(BaseEncoder):
    """Transformer text encoder (reference ``cub.py:40-105``).

    Args mirror the reference: latent_dim, max_sentence_length, ntokens,
    embed_size, nhead, ff_size, n_layers, dropout (dropout disabled in the
    deterministic/eval path used for training VAEs here).
    """

    latent_dim: int
    max_sentence_length: int
    ntokens: int
    embed_size: int = 512
    nhead: int = 4
    ff_size: int = 1024
    n_layers: int = 4
    dropout: float = 0.5

    @nn.compact
    def __call__(self, inputs):
        tokens = inputs["tokens"]
        padding_mask = inputs["padding_mask"]

        emb = nn.Embed(
            self.ntokens, self.embed_size,
            embedding_init=nn.initializers.uniform(scale=0.2),
        )(tokens.astype(jnp.int32))
        emb = emb * math.sqrt(self.embed_size)
        pe = jnp.asarray(positional_encoding(self.max_sentence_length,
                                             self.embed_size))
        h = emb + pe[None, : emb.shape[1]]
        for _ in range(self.n_layers):
            h = TransformerEncoderLayer(
                self.embed_size, self.nhead, self.ff_size, self.dropout
            )(h, padding_mask)
        flat = h.reshape(h.shape[0], -1)
        return ModelOutput(
            embedding=nn.Dense(self.latent_dim)(flat),
            log_covariance=nn.Dense(self.latent_dim)(flat),
            transformer_output=h,
        )


class CubTextDecoderMLP(BaseDecoder):
    """Simple MLP decoder for CUB text logits (reference ``cub.py:107-140``)."""

    args: BaseAEConfig

    @property
    def latent_dim(self):
        return self.args.latent_dim

    @nn.compact
    def __call__(self, z):
        out = nn.relu(nn.Dense(512)(z))
        out = nn.Dense(int(np.prod(self.args.input_dim)))(out)
        output_shape = (*z.shape[:-1], *self.args.input_dim)
        return ModelOutput(reconstruction=out.reshape(output_shape))


class PreActResnetBlock(nn.Module):
    """Pre-activation residual block (reference ``cub.py:250-283``)."""

    fin: int
    fout: int
    fhidden: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        fhidden = self.fhidden or min(self.fin, self.fout)
        dx = conv(fhidden, 3, 1, 1, self.fin)(
            nn.leaky_relu(x, negative_slope=0.2))
        dx = conv(self.fout, 3, 1, 1, fhidden)(
            nn.leaky_relu(dx, negative_slope=0.2))
        if self.fin != self.fout:
            x_s = conv(self.fout, 1, 1, 0, self.fin, use_bias=False)(x)
        else:
            x_s = x
        return x_s + 0.1 * dx


class CUB_Resnet_Encoder(BaseEncoder):
    """Resnet image encoder for 64x64 CUB images (reference ``:144-193``)."""

    latent_dim: int
    s0: int = 16
    nfilter: int = 64
    nfilter_max: int = 1024

    @nn.compact
    def __call__(self, x):
        size = 64
        nf, nf_max, s0 = self.nfilter, self.nfilter_max, self.s0
        nlayers = int(np.log2(size / s0))
        nf0 = min(nf_max, nf * 2**nlayers)

        h = _nchw_to_nhwc(x.reshape(-1, 3, size, size))
        h = conv(nf, 3, 1, 1, 3)(h)
        h = PreActResnetBlock(nf, nf)(h)
        for i in range(nlayers):
            c0 = min(nf * 2**i, nf_max)
            c1 = min(nf * 2 ** (i + 1), nf_max)
            h = _avg_pool_3_2_1(h)
            h = PreActResnetBlock(c0, c1)(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.leaky_relu(h, negative_slope=0.2)
        return ModelOutput(
            embedding=nn.Dense(self.latent_dim)(h),
            log_covariance=nn.Dense(self.latent_dim)(h),
        )


class CUB_Resnet_Decoder(BaseDecoder):
    """Resnet image decoder for 64x64 CUB images (reference ``:196-248``)."""

    latent_dim: int
    s0: int = 16
    nfilter: int = 64
    nfilter_max: int = 512

    @nn.compact
    def __call__(self, z):
        size = 64
        nf, nf_max, s0 = self.nfilter, self.nfilter_max, self.s0
        nlayers = int(np.log2(size / s0))
        nf0 = min(nf_max, nf * 2**nlayers)

        lead = z.shape[:-1]
        h = nn.Dense(nf0 * s0 * s0)(z.reshape(-1, z.shape[-1]))
        h = h.reshape(-1, nf0, s0, s0)
        h = _nchw_to_nhwc(h)
        for i in range(nlayers):
            c0 = min(nf * 2 ** (nlayers - i), nf_max)
            c1 = min(nf * 2 ** (nlayers - i - 1), nf_max)
            h = PreActResnetBlock(c0, c1)(h)
            h = _upsample_nearest_2x(h)
        h = PreActResnetBlock(nf, nf)(h)
        h = conv(3, 3, 1, 1, nf)(nn.leaky_relu(h, negative_slope=0.2))
        h = _nhwc_to_nchw(h)
        return ModelOutput(reconstruction=h.reshape(*lead, 3, size, size))
