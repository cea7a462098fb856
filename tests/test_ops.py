"""Ops-layer parity tests: exact values vs torch.distributions formulas."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.ops import (
    all_subsets_mask,
    cross_entropy,
    kl_divergence,
    masked_poe,
    poe,
    rsample_from_gaussian,
    set_decoder_dist,
    stable_poe,
)
from multivae_tpu.ops.gaussian import gaussian_log_prob


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_kl_divergence_matches_torch(rng):
    import torch

    mean = rng.normal(size=(4, 6)).astype(np.float32)
    log_var = rng.normal(size=(4, 6)).astype(np.float32)
    pm = rng.normal(size=(4, 6)).astype(np.float32)
    plv = rng.normal(size=(4, 6)).astype(np.float32)

    ours = kl_divergence(mean, log_var, pm, plv)

    t = lambda x: torch.tensor(x)
    ref = 0.5 * (
        t(plv) - t(log_var)
        + torch.exp(t(log_var) - t(plv))
        + (t(mean) - t(pm)) ** 2 / torch.exp(t(plv))
        - 1
    )
    ref = ref.sum(dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_kl_divergence_standard_normal_zero():
    mean = jnp.zeros((3, 5))
    lv = jnp.zeros((3, 5))
    np.testing.assert_allclose(
        np.asarray(kl_divergence(mean, lv, mean, lv)), 0.0, atol=1e-7
    )


def test_poe_matches_reference_formula(rng):
    mus = rng.normal(size=(3, 4, 6)).astype(np.float32)
    lvs = rng.normal(size=(3, 4, 6)).astype(np.float32)

    mu_j, lv_j = poe(jnp.asarray(mus), jnp.asarray(lvs))

    var = np.exp(lvs) + 1e-8
    T = 1.0 / var
    ref_mu = (mus * T).sum(0) / T.sum(0)
    ref_lv = np.log(1.0 / T.sum(0))
    np.testing.assert_allclose(np.asarray(mu_j), ref_mu, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_j), ref_lv, rtol=1e-4, atol=1e-5)


def test_stable_poe_close_to_poe(rng):
    mus = rng.normal(size=(3, 4, 6)).astype(np.float32)
    lvs = rng.normal(size=(3, 4, 6)).astype(np.float32)
    mu1, lv1 = poe(jnp.asarray(mus), jnp.asarray(lvs), eps=0.0)
    mu2, lv2 = stable_poe(jnp.asarray(mus), jnp.asarray(lvs))
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv2), rtol=1e-3, atol=1e-4)


def test_stable_poe_single_expert(rng):
    mus = rng.normal(size=(1, 4, 6)).astype(np.float32)
    lvs = rng.normal(size=(1, 4, 6)).astype(np.float32)
    mu, lv = stable_poe(jnp.asarray(mus), jnp.asarray(lvs))
    np.testing.assert_allclose(np.asarray(mu), mus[0])
    np.testing.assert_allclose(np.asarray(lv), lvs[0])


def test_masked_poe_equals_poe_on_subset(rng):
    """Masking expert 0 must equal PoE over experts 1..2 only."""
    mus = rng.normal(size=(3, 4, 6)).astype(np.float32)
    lvs = rng.normal(size=(3, 4, 6)).astype(np.float32)
    mask = np.ones((3, 4), np.float32)
    mask[0, :] = 0.0

    mu_m, lv_m = masked_poe(jnp.asarray(mus), jnp.asarray(lvs), jnp.asarray(mask))
    mu_r, lv_r = poe(jnp.asarray(mus[1:]), jnp.asarray(lvs[1:]))
    np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_m), np.asarray(lv_r), rtol=1e-4, atol=1e-5)


def test_masked_poe_zero_gradient_to_masked_expert(rng):
    """The defining property: masked experts receive exactly zero grads."""
    mus = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    lvs = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    mask = jnp.asarray(np.array([[0, 0, 0], [1, 1, 1]], np.float32))

    def loss(mus, lvs):
        mu, lv = masked_poe(mus, lvs, mask)
        return jnp.sum(mu**2) + jnp.sum(lv**2)

    gm, gl = jax.grad(loss, argnums=(0, 1))(mus, lvs)
    np.testing.assert_allclose(np.asarray(gm[0]), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gl[0]), 0.0, atol=1e-8)
    assert np.abs(np.asarray(gm[1])).sum() > 0


def test_masked_poe_all_dead_row_falls_back_to_prior(rng):
    """Rows with NO live expert get the prior N(0, I) instead of the
    degenerate 1e-20-precision posterior; live rows are untouched."""
    mus = rng.normal(size=(2, 3, 4)).astype(np.float32)
    lvs = rng.normal(size=(2, 3, 4)).astype(np.float32)
    mask = np.array([[0, 1, 1], [0, 1, 0]], np.float32)

    mu, lv = masked_poe(jnp.asarray(mus), jnp.asarray(lvs), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(mu[0]), 0.0)
    np.testing.assert_allclose(np.asarray(lv[0]), 0.0)
    assert np.all(np.isfinite(np.asarray(lv)))


def test_masked_poe_precision_underflow_backstop(rng):
    """A row whose mask says alive but whose expert precisions ALL
    underflow (finite exp(log_var) near the f32 max -> subnormal or
    TPU-flushed-to-zero precision, reachable in diverged training) must
    also fall back to the prior — not to the log_var ~ +46 posterior
    whose samples overflow decoder intermediates into NaN gradients —
    with finite gradients.

    log_var = 88.5: exp = 2.7e38 (finite), precision ~ 3.7e-39, total
    precision far below the 1e-20 dead threshold. (Past the exp
    OVERFLOW point, ~88.7, the VALUE path still falls back to the
    prior, asserted below, but the backward is inf/inf NaN exactly as
    in the reference torch implementation — the trainer NaN guard's
    job; hardening it with a clip/minimum on the exp argument measurably
    breaks the host-vs-cached bit-identity pins, see masked_poe's
    comment.)"""
    mus = rng.normal(size=(2, 3, 4)).astype(np.float32)
    lvs = np.full((2, 3, 4), 88.5, np.float32)
    mask = np.ones((2, 3), np.float32)

    def loss(mus, lvs):
        mu, lv = masked_poe(mus, lvs, jnp.asarray(mask))
        return jnp.sum(mu**2) + jnp.sum(lv**2)

    mu, lv = masked_poe(jnp.asarray(mus), jnp.asarray(lvs), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(lv), 0.0)  # prior, not +46
    gm, gl = jax.grad(loss, argnums=(0, 1))(jnp.asarray(mus),
                                            jnp.asarray(lvs))
    assert np.all(np.isfinite(np.asarray(gm)))
    assert np.all(np.isfinite(np.asarray(gl)))

    # exp-overflow regime: the VALUE path still produces the prior
    lvs_inf = np.full((2, 3, 4), 120.0, np.float32)  # exp -> inf
    mu2, lv2 = masked_poe(jnp.asarray(mus), jnp.asarray(lvs_inf),
                          jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(lv2), 0.0)

    # the [clamp, old-1e-30-threshold) band: log_var = +55 gives total
    # precision ~ 3.9e-24 — above 1e-30 but at/below the 1e-20 clamp
    # floor after f32 rounding of nearby magnitudes; the threshold must
    # MATCH the clamp so no reachable total precision falls through to
    # the degenerate log_var ~ +46 posterior. Assert the contract
    # directly: the returned log_var is either a healthy posterior
    # (< 44, i.e. nowhere near the clamp) or the exact prior 0.0.
    for lv_band in (50.0, 55.0, 60.0, 65.0):
        lvs_band = np.full((2, 3, 4), lv_band, np.float32)
        _, lvb = masked_poe(jnp.asarray(mus), jnp.asarray(lvs_band),
                            jnp.asarray(mask))
        lvb = np.asarray(lvb)
        assert np.all((lvb < 44.0) | (lvb == 0.0)), (lv_band, lvb)
    assert np.all(np.isfinite(np.asarray(mu2)))


def test_masked_poe_fractional_mask_rows_not_perturbed(rng):
    """Availability weights in (0, 1) scale precisions but must NOT
    trigger any partial prior fallback on rows with live experts."""
    mus = rng.normal(size=(2, 3, 4)).astype(np.float32)
    lvs = rng.normal(size=(2, 3, 4)).astype(np.float32)
    frac = np.full((2, 3), 0.25, np.float32)

    mu_f, lv_f = masked_poe(jnp.asarray(mus), jnp.asarray(lvs),
                            jnp.asarray(frac))
    # reference: scale the precisions directly and run unmasked PoE
    lvs_scaled = lvs - np.log(0.25)  # precision * 0.25
    mu_r, lv_r = poe(jnp.asarray(mus), jnp.asarray(lvs_scaled))
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_f), np.asarray(lv_r),
                               rtol=1e-4, atol=1e-5)


def test_stable_poe_masked_zero_gradient(rng):
    mus = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    lvs = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    mask = jnp.asarray(np.array([[0, 1, 0], [1, 1, 1]], np.float32))

    def loss(mus, lvs):
        mu, lv = stable_poe(mus, lvs, mask)
        return jnp.sum(mu**2) + jnp.sum(lv**2)

    gm, _ = jax.grad(loss, argnums=(0, 1))(mus, lvs)
    np.testing.assert_allclose(np.asarray(gm[0, 0]), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gm[0, 2]), 0.0, atol=1e-8)
    assert np.abs(np.asarray(gm[0, 1])).sum() > 0


def test_rsample_shapes(rng):
    key = jax.random.key(0)
    mu = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    lv = jnp.zeros((5, 7))

    assert rsample_from_gaussian(key, mu, lv).shape == (5, 7)
    assert rsample_from_gaussian(key, mu, lv, N=3).shape == (3, 5, 7)
    assert rsample_from_gaussian(key, mu, lv, N=3, flatten=True).shape == (15, 7)
    m = rsample_from_gaussian(key, mu, lv, N=4, return_mean=True)
    assert m.shape == (4, 5, 7)
    np.testing.assert_allclose(np.asarray(m[0]), np.asarray(mu))


def test_gaussian_log_prob_matches_torch(rng):
    import torch

    x = rng.normal(size=(4, 6)).astype(np.float32)
    mu = rng.normal(size=(4, 6)).astype(np.float32)
    lv = rng.normal(size=(4, 6)).astype(np.float32)

    ours = gaussian_log_prob(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(lv))
    ref = (
        torch.distributions.Normal(
            torch.tensor(mu), torch.exp(0.5 * torch.tensor(lv))
        )
        .log_prob(torch.tensor(x))
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dist_name,params", [
    ("normal", {}),
    ("normal", {"scale": 0.75}),
    ("laplace", {}),
    ("laplace", {"scale": 0.5}),
    ("bernoulli", {}),
])
def test_decoder_dists_match_torch(dist_name, params, rng):
    import torch

    recon = rng.normal(size=(4, 3, 2)).astype(np.float32)
    if dist_name == "bernoulli":
        target = (rng.uniform(size=(4, 3, 2)) > 0.5).astype(np.float32)
    else:
        target = rng.normal(size=(4, 3, 2)).astype(np.float32)

    log_prob = set_decoder_dist(dist_name, dict(params))
    ours = np.asarray(log_prob(jnp.asarray(recon), jnp.asarray(target)))

    scale = params.get("scale", 1.0)
    tr, tt = torch.tensor(recon), torch.tensor(target)
    if dist_name == "normal":
        ref = torch.distributions.Normal(tr, scale).log_prob(tt)
    elif dist_name == "laplace":
        ref = torch.distributions.Laplace(tr, scale).log_prob(tt)
    else:
        ref = torch.distributions.Bernoulli(logits=tr).log_prob(tt)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=1e-4)


def test_cross_entropy_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    logits = rng.normal(size=(4, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(4,))
    one_hot = np.eye(10, dtype=np.float32)[labels]

    ours = np.asarray(cross_entropy(jnp.asarray(logits), jnp.asarray(one_hot)))
    ref = (
        torch.tensor(one_hot) * F.log_softmax(torch.tensor(logits) + 1e-6, dim=-1)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)

    # dict targets with tokens
    ours_tok = np.asarray(
        cross_entropy(jnp.asarray(logits), {"tokens": jnp.asarray(labels)})
    )
    np.testing.assert_allclose(ours_tok, ref, rtol=1e-4, atol=1e-6)


def test_all_subsets_mask():
    subsets, mask = all_subsets_mask(["a", "b", "c"])
    assert len(subsets) == 7  # 2^3 - 1
    assert mask.shape == (7, 3)
    # singletons first, full set last
    assert subsets[0] == ("a",)
    assert subsets[-1] == ("a", "b", "c")
    np.testing.assert_allclose(mask[-1], [1, 1, 1])
    np.testing.assert_allclose(mask.sum(-1), [1, 1, 1, 2, 2, 2, 3])


def test_chunked_logsumexp_matches_manual_rng_replay():
    """chunked_logsumexp (scan over full chunks + remainder) == manually
    replaying the same rng split chain and logsumexp-ing all weights at
    once — exact, including the remainder path."""
    from multivae_tpu.ops.iwae import chunked_logsumexp

    B, K, chunk = 3, 17, 5  # 3 full chunks + remainder of 2

    def chunk_lse(rng, n):
        return jax.nn.logsumexp(jax.random.normal(rng, (n, B)), axis=0)

    got = np.asarray(
        chunked_logsumexp(chunk_lse, jax.random.key(0), K, chunk))

    rng_key = jax.random.key(0)
    parts = []
    for _ in range(K // chunk):
        rng_key, sub = jax.random.split(rng_key)
        parts.append(jax.random.normal(sub, (chunk, B)))
    rng_key, sub = jax.random.split(rng_key)
    parts.append(jax.random.normal(sub, (K % chunk, B)))
    want = np.asarray(jax.nn.logsumexp(jnp.concatenate(parts), axis=0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
