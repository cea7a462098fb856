"""Masked autoregressive flows (MADE / MAF / IAF) as Flax modules.

The reference delegates flows to pythae (``jnf_model.py:9-10``,
``maf_sampler.py:6``); a TPU-native rebuild re-implements them (SURVEY §2.4):
MADE masks are constant matrices baked at module construction; the parallel
direction is a dense masked-MLP stack and the sequential direction is a
``lax.fori_loop`` over latent dimensions.

Conventions (Papamakarios et al. 2017):
- MAF.__call__(x): density direction x -> u, parallel;
  u = (x - mu(x)) * exp(-alpha(x)), log|det| = -sum(alpha).
- MAF.inverse(u): sampling direction u -> x, sequential in D.
- IAF is the transpose: sequential density, parallel sampling.
- log_prob uses a standard-normal base distribution.

Both return ``ModelOutput(out=..., log_abs_det_jac=...)`` mirroring pythae's
flow API so model code reads the same.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.model_output import ModelOutput

_LOG_2PI = math.log(2.0 * math.pi)


def made_masks(input_dim: int, hidden_sizes: Sequence[int]):
    """Binary MADE masks for the hidden layers + the output layer."""
    degrees = [np.arange(1, input_dim + 1)]
    for h in hidden_sizes:
        if input_dim > 1:
            degrees.append((np.arange(h) % (input_dim - 1)) + 1)
        else:
            degrees.append(np.ones(h, dtype=int))
    masks = []
    for d_in, d_out in zip(degrees[:-1], degrees[1:]):
        masks.append((d_out[None, :] >= d_in[:, None]).astype(np.float32))
    # output layer: strict inequality (outputs depend only on x_<i)
    out_mask = (degrees[0][None, :] > degrees[-1][:, None]).astype(np.float32)
    return masks, out_mask


class MaskedDense(nn.Module):
    features: int
    mask: Tuple[Tuple[float, ...], ...]  # (in, out) static

    @nn.compact
    def __call__(self, x):
        mask = jnp.asarray(np.asarray(self.mask, np.float32))
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(),
            (x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ (kernel * mask) + bias


def _to_static(mask: np.ndarray):
    return tuple(tuple(float(v) for v in row) for row in mask)


class MADE(nn.Module):
    """One autoregressive block producing (mu, alpha) per dimension."""

    input_dim: int
    hidden_sizes: Tuple[int, ...] = (128, 128, 128)

    @nn.compact
    def __call__(self, x):
        masks, out_mask = made_masks(self.input_dim, self.hidden_sizes)
        h = x
        for i, m in enumerate(masks):
            h = MaskedDense(m.shape[1], _to_static(m), name=f"hidden_{i}")(h)
            h = nn.relu(h)
        mu = MaskedDense(self.input_dim, _to_static(out_mask), name="mu")(h)
        alpha = MaskedDense(self.input_dim, _to_static(out_mask),
                            name="alpha")(h)
        # stabilize the scale like standard MAF implementations
        alpha = jnp.tanh(alpha) * 3.0
        return mu, alpha


class MAF(nn.Module):
    """Masked Autoregressive Flow: fast density, sequential sampling."""

    input_dim: int
    n_made_blocks: int = 2
    hidden_size: int = 128
    n_hidden_in_made: int = 3

    def setup(self):
        self.blocks = [
            MADE(self.input_dim,
                 (self.hidden_size,) * self.n_hidden_in_made)
            for _ in range(self.n_made_blocks)
        ]

    def __call__(self, x) -> ModelOutput:
        """Density direction x -> u (parallel)."""
        u = x
        log_det = jnp.zeros(x.shape[:-1])
        for block in self.blocks:
            mu, alpha = block(u)
            u = (u - mu) * jnp.exp(-alpha)
            log_det = log_det - alpha.sum(-1)
            u = u[..., ::-1]  # reverse ordering between blocks
        return ModelOutput(out=u, log_abs_det_jac=log_det)

    def inverse(self, u) -> ModelOutput:
        """Sampling direction u -> x (sequential in D per block)."""
        x = u
        log_det = jnp.zeros(u.shape[:-1])
        for block in reversed(self.blocks):
            x = x[..., ::-1]  # undo the reversal

            def body(_, x_cur):
                mu, alpha = block(x_cur)
                return x * jnp.exp(alpha) + mu

            def loop(x_init):
                return jax.lax.fori_loop(0, self.input_dim, body, x_init)

            x_new = loop(jnp.zeros_like(x))
            mu, alpha = block(x_new)
            log_det = log_det + alpha.sum(-1)
            # x (captured) is the 'u' of this block: x_new = x*e^alpha + mu
            x = x_new
        return ModelOutput(out=x, log_abs_det_jac=log_det)

    def log_prob(self, x):
        """log density under a standard-normal base."""
        out = self(x)
        base = -0.5 * (out["out"] ** 2 + _LOG_2PI)
        return base.sum(-1) + out["log_abs_det_jac"]


class IAF(nn.Module):
    """Inverse Autoregressive Flow: fast sampling, sequential density."""

    input_dim: int
    n_made_blocks: int = 2
    hidden_size: int = 128
    n_hidden_in_made: int = 3

    def setup(self):
        self.blocks = [
            MADE(self.input_dim,
                 (self.hidden_size,) * self.n_hidden_in_made)
            for _ in range(self.n_made_blocks)
        ]

    def __call__(self, x) -> ModelOutput:
        """Density direction x -> u (sequential in D per block)."""
        u = x
        log_det = jnp.zeros(x.shape[:-1])
        for block in reversed(self.blocks):
            if self.is_initializing():
                # create the block's params outside the traced loop
                block(u)
            u_target = u

            def body(_, u_cur):
                mu, alpha = block(u_cur)
                return u_target * jnp.exp(alpha) + mu

            u_new = jax.lax.fori_loop(0, self.input_dim, body,
                                      jnp.zeros_like(u))
            _, alpha = block(u_new)
            log_det = log_det + alpha.sum(-1)
            u = u_new[..., ::-1]
        return ModelOutput(out=u, log_abs_det_jac=log_det)

    def inverse(self, u) -> ModelOutput:
        """Sampling direction u -> x (parallel)."""
        x = u
        log_det = jnp.zeros(u.shape[:-1])
        for block in self.blocks:
            x = x[..., ::-1]
            mu, alpha = block(x)
            x = (x - mu) * jnp.exp(-alpha)
            log_det = log_det - alpha.sum(-1)
        return ModelOutput(out=x, log_abs_det_jac=log_det)

    def log_prob(self, x):
        out = self(x)
        base = -0.5 * (out["out"] ** 2 + _LOG_2PI)
        return base.sum(-1) + out["log_abs_det_jac"]
