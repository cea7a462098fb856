"""Location-scale distributions for K-sample MoE models (MMVAE family).

The reference parameterizes posteriors/priors as Laplace-with-softmax-scale
or Normal (``src/multivae/models/mmvae/mmvae_model.py:44-93``,
``mmvaePlus_model.py:113-124``). Scale transforms:

- 'laplace_with_softmax': scale = softmax(log_var, -1) * D + 1e-6
- 'normal':               scale = exp(0.5 * log_var)
- 'normal_with_softplus': scale = softplus(log_var) + 1e-6
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)

POSTERIOR_DISTS = ("laplace_with_softmax", "normal", "normal_with_softplus")


def check_dist_name(name: str):
    if name not in POSTERIOR_DISTS:
        raise AttributeError(
            "The posterior_dist parameter must be either "
            "'laplace_with_softmax','normal' or 'normal_with_softplus'. "
            f"{name} was provided."
        )


def log_var_to_std(log_var, dist_name: str):
    """Reference ``log_var_to_std`` (``mmvae_model.py:66-74``)."""
    if dist_name == "laplace_with_softmax":
        return jax.nn.softmax(log_var, axis=-1) * log_var.shape[-1] + 1e-6
    if dist_name == "normal_with_softplus":
        return jax.nn.softplus(log_var) + 1e-6
    return jnp.exp(0.5 * log_var)


def _base_dist(dist_name: str) -> str:
    return "laplace" if dist_name == "laplace_with_softmax" else "normal"


def dist_log_prob(dist_name: str, x, loc, scale):
    """Elementwise log-prob of the location-scale family."""
    dtype = jnp.result_type(x, loc, scale)
    x = jnp.asarray(x, dtype)
    loc = jnp.asarray(loc, dtype)
    scale = jnp.asarray(scale, dtype)
    if _base_dist(dist_name) == "laplace":
        return -jnp.abs(x - loc) / scale - jnp.log(2.0 * scale)
    return (
        -0.5 * ((x - loc) / scale) ** 2 - jnp.log(scale) - 0.5 * _LOG_2PI
    )


def dist_rsample_k(rng, dist_name: str, loc, scale, K: int):
    """Like ``dist_rsample`` but ALWAYS returns a leading K axis, including
    K=1 (the MMVAE+ paper protocol trains with K=1; the K-sample
    objectives index that axis, reference ``mmvaePlus_model.py:151``)."""
    z = dist_rsample(rng, dist_name, loc, scale, K=K)
    return z[None] if K == 1 else z


def mixture_logsumexp(z, mus, sigmas, mask, dist_name: str):
    """logsumexp over experts of the masked MoE density (MZ, K, B).

    The hot op of the MMVAE-family objectives (reference
    ``mmvae_model.py:160-236`` evaluates every expert against every
    modality's samples). Dispatches to the fused Pallas TPU kernel when
    shapes/dtypes allow; otherwise the XLA composition.
    """
    from .pallas_mixture import mixture_log_density

    return mixture_log_density(z, mus, sigmas, mask,
                               dist=_base_dist(dist_name))


def dist_rsample(rng, dist_name: str, loc, scale, K: int = 1):
    """Reparameterized sampling; K > 1 prepends a sample axis.

    Laplace uses the inverse-CDF transform (same as
    torch.distributions.Laplace.rsample).
    """
    dtype = jnp.result_type(loc, scale)
    loc = jnp.asarray(loc, dtype)
    scale = jnp.asarray(scale, dtype)
    shape = loc.shape if K == 1 else (K, *loc.shape)
    if _base_dist(dist_name) == "laplace":
        finfo = jnp.finfo(loc.dtype)
        u = jax.random.uniform(
            rng, shape, dtype=dtype,
            minval=-0.5 + finfo.eps, maxval=0.5,
        )
        return loc - scale * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))
    noise = jax.random.normal(rng, shape, dtype=loc.dtype)
    return loc + scale * noise
