"""Tests for MADE/MAF/IAF flows: invertibility, density consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.ops.flows import IAF, MADE, MAF, made_masks


def test_made_masks_autoregressive():
    masks, out_mask = made_masks(4, (8, 8))
    # composite connectivity: output i must not depend on inputs >= i
    conn = masks[0] @ masks[1] @ out_mask  # (in, out)
    for i in range(4):
        for j in range(4):
            if j <= i:
                assert conn[i, j] == 0, (i, j)


def test_made_autoregressive_property():
    """Perturbing input dim i must not change outputs for dims <= i."""
    made = MADE(input_dim=5, hidden_sizes=(16, 16))
    params = made.init(jax.random.key(0), jnp.zeros((1, 5)))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5)),
                    jnp.float32)
    mu1, _ = made.apply(params, x)
    x2 = x.at[0, 2].add(10.0)
    mu2, _ = made.apply(params, x2)
    np.testing.assert_allclose(np.asarray(mu1[0, :3]), np.asarray(mu2[0, :3]),
                               atol=1e-6)
    assert np.abs(np.asarray(mu1[0, 3:]) - np.asarray(mu2[0, 3:])).sum() > 0


@pytest.mark.parametrize("flow_cls", [MAF, IAF])
def test_flow_round_trip(flow_cls):
    D = 6
    flow = flow_cls(input_dim=D, n_made_blocks=2, hidden_size=32,
                    n_hidden_in_made=2)
    params = flow.init(jax.random.key(0), jnp.zeros((1, D)))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(7, D)), jnp.float32)

    fwd = flow.apply(params, x)
    back = flow.apply(params, fwd["out"], method=flow_cls.inverse)
    np.testing.assert_allclose(np.asarray(back["out"]), np.asarray(x),
                               rtol=1e-3, atol=1e-4)
    # log-dets of forward and inverse must cancel
    np.testing.assert_allclose(
        np.asarray(fwd["log_abs_det_jac"] + back["log_abs_det_jac"]),
        0.0, atol=1e-4,
    )


@pytest.mark.parametrize("flow_cls", [MAF, IAF])
def test_flow_log_prob_matches_jacobian(flow_cls):
    """log_prob must equal base log-density + log|det J| computed by
    autodiff of the forward map."""
    D = 3
    flow = flow_cls(input_dim=D, n_made_blocks=2, hidden_size=16,
                    n_hidden_in_made=2)
    params = flow.init(jax.random.key(0), jnp.zeros((1, D)))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, D)), jnp.float32)

    def fwd_fn(x_single):
        return flow.apply(params, x_single[None])["out"][0]

    J = jax.jacobian(fwd_fn)(x[0])
    _, logdet_autodiff = jnp.linalg.slogdet(J)

    out = flow.apply(params, x)
    np.testing.assert_allclose(
        float(out["log_abs_det_jac"][0]), float(logdet_autodiff), rtol=1e-3,
        atol=1e-4,
    )

    lp = flow.apply(params, x, method=flow_cls.log_prob)
    u = out["out"]
    base = (-0.5 * (u**2 + np.log(2 * np.pi))).sum()
    np.testing.assert_allclose(
        float(lp[0]), float(base + out["log_abs_det_jac"][0]), rtol=1e-4,
        atol=1e-5,
    )


def test_maf_density_improves_with_training():
    """Fitting a MAF on shifted data must beat the untrained density."""
    import optax

    D = 2
    rng = np.random.default_rng(3)
    data = jnp.asarray(rng.normal(loc=3.0, size=(256, D)), jnp.float32)
    flow = MAF(input_dim=D, n_made_blocks=2, hidden_size=32,
               n_hidden_in_made=2)
    params = flow.init(jax.random.key(0), jnp.zeros((1, D)))

    def nll(p):
        return -flow.apply(p, data, method=MAF.log_prob).mean()

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(nll)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    first = float(nll(params))
    for _ in range(100):
        params, state, loss = step(params, state)
    assert float(loss) < first - 1.0
