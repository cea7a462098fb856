"""Initializers matching PyTorch's nn.Linear / nn.Conv defaults.

The reference relies on torch default init (kaiming_uniform(a=sqrt(5)) for
weights + uniform bias), which for both Linear and Conv reduces to
U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Flax defaults (lecun_normal, zero bias)
differ; to make ELBO curves comparable within seed noise (SURVEY §7.3
"ELBO-curve parity"), default architectures use these initializers.
"""

from __future__ import annotations

import numpy as np

import jax


def _uniform_bound(key, shape, dtype, bound):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_kernel_init(key, shape, dtype):
    """Flax Dense kernel has shape (fan_in, fan_out)."""
    fan_in = shape[0]
    return _uniform_bound(key, shape, dtype, 1.0 / np.sqrt(fan_in))


def torch_conv_kernel_init(key, shape, dtype):
    """Flax Conv kernel has shape (*window, in_features, out_features)."""
    fan_in = int(np.prod(shape[:-1]))
    return _uniform_bound(key, shape, dtype, 1.0 / np.sqrt(fan_in))


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype):
        return _uniform_bound(key, shape, dtype, bound)

    return init


def dense(features: int, in_features: int, **kwargs):
    """An nn.Dense with torch-default init (needs fan_in for the bias)."""
    import flax.linen as nn

    return nn.Dense(
        features,
        kernel_init=torch_linear_kernel_init,
        bias_init=make_torch_bias_init(in_features),
        **kwargs,
    )
