"""Pallas fused mixture log-density kernel vs the XLA composition.

The kernel runs in interpret mode here (CPU test mesh); the TPU lowering
is exercised by bench.py / real-chip runs. Reference behavior:
``src/multivae/models/mmvae/mmvae_model.py:160-236`` (masked MoE density).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import multivae_tpu.ops.pallas_mixture as pm
from multivae_tpu.ops.kdist import mixture_logsumexp

MQ, MZ, K, B, D = 3, 3, 4, 64, 128


@pytest.fixture(autouse=True)
def interpret_mode():
    pm._INTERPRET = True
    yield
    pm._INTERPRET = False


@pytest.fixture
def inputs():
    key = jax.random.key(0)
    z = jax.random.normal(key, (MZ, K, B, D))
    mus = jax.random.normal(jax.random.fold_in(key, 1), (MQ, B, D))
    sig = jax.random.uniform(jax.random.fold_in(key, 2), (MQ, B, D)) + 0.5
    mask = jnp.ones((MQ, B)).at[1, :30].set(0.0)
    return z, mus, sig, mask


@pytest.mark.parametrize("dist", ["laplace", "normal"])
def test_forward_matches_xla(inputs, dist):
    z, mus, sig, mask = inputs
    ref = pm.mixture_log_density_xla(z, mus, sig, mask, dist)
    out = pm._mixture_pallas(z, mus, sig, mask, dist)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("dist", ["laplace", "normal"])
def test_gradients_match_xla(inputs, dist):
    z, mus, sig, mask = inputs

    def ref_loss(z, m, s):
        return pm.mixture_log_density_xla(z, m, s, mask, dist).sum()

    def pal_loss(z, m, s):
        return pm._mixture_pallas(z, m, s, mask, dist).sum()

    gref = jax.grad(ref_loss, argnums=(0, 1, 2))(z, mus, sig)
    gpal = jax.grad(pal_loss, argnums=(0, 1, 2))(z, mus, sig)
    for a, b in zip(gref, gpal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-3)


def test_fully_masked_column_is_finite_grad(inputs):
    """A sample row whose every expert is masked must not produce NaNs in
    the other rows' gradients (the fill value is a large negative, not
    -inf)."""
    z, mus, sig, _ = inputs
    mask = jnp.ones((MQ, B)).at[:, 0].set(0.0)
    g = jax.grad(
        lambda z: (pm._mixture_pallas(z, mus, sig, mask, "laplace")
                   [:, :, 1:]).sum()
    )(z)
    assert np.isfinite(np.asarray(g)).all()


def test_dispatcher_fallback_on_cpu(inputs):
    """On the CPU backend the dispatcher must take the XLA path (and agree
    with the explicit XLA function bit-for-bit)."""
    z, mus, sig, mask = inputs
    ref = pm.mixture_log_density_xla(z, mus, sig, mask, "laplace")
    out = mixture_logsumexp(z, mus, sig, mask, "laplace_with_softmax")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fallback_on_unsupported_shapes():
    """Odd D (not a lane multiple) must fall back rather than error."""
    key = jax.random.key(1)
    z = jax.random.normal(key, (2, 3, 16, 7))
    mus = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 7))
    sig = jnp.ones((2, 16, 7))
    mask = jnp.ones((2, 16))
    ref = pm.mixture_log_density_xla(z, mus, sig, mask, "normal")
    out = pm.mixture_log_density(z, mus, sig, mask, "normal")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
