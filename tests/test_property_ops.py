"""Property-based tests for the core aggregation/likelihood kernels.

The fixed-point torch comparisons live in ``test_ops.py``; these
hypothesis sweeps pin the ALGEBRAIC contracts over randomized shapes and
values — the invariants every model builds on (reference math:
``src/multivae/models/base/base_utils.py``):

- expert exclusion: a zero-masked expert is exactly equivalent to not
  stacking it at all (the foundation of incomplete-data handling AND the
  one-program masked-subset encode);
- PoE formulations agree (precision form == logsumexp-stabilized form);
- Gaussian KL matches torch.distributions on random parameters;
- chunked logsumexp/IWAE reductions are chunking-invariant;
- decoder log-probs match torch.distributions on random parameters.
"""

import numpy as np
import torch
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from multivae_tpu.ops.dists import (
    bernoulli_logits_log_prob,
    laplace_log_prob,
    normal_log_prob,
)
from multivae_tpu.ops.gaussian import (
    kl_divergence,
    masked_poe,
    poe,
    rsample_from_gaussian,
    stable_poe,
)
from multivae_tpu.ops.iwae import chunked_logsumexp, iwae_log_marginal
from multivae_tpu.ops.subsets import all_subsets, subsets_to_mask

SETTINGS = dict(max_examples=25, deadline=None)


def arrays(draw, *shape, lo=-4.0, hi=4.0):
    return draw(st.lists(
        st.floats(lo, hi, width=32), min_size=int(np.prod(shape)),
        max_size=int(np.prod(shape)),
    ))


@st.composite
def expert_stack(draw):
    M = draw(st.integers(2, 5))
    B = draw(st.integers(1, 4))
    D = draw(st.integers(1, 6))
    mus = np.asarray(arrays(draw, M, B, D), np.float32).reshape(M, B, D)
    lvs = np.asarray(arrays(draw, M, B, D, lo=-6, hi=4),
                     np.float32).reshape(M, B, D)
    return mus, lvs


@settings(**SETTINGS)
@given(expert_stack(), st.integers(0, 4))
def test_zero_masked_expert_equals_exclusion(stack, drop):
    """mask[i]=0 must reproduce the PoE computed WITHOUT expert i."""
    mus, lvs = stack
    M, B, _ = mus.shape
    drop = drop % M
    mask = np.ones((M, B), np.float32)
    mask[drop] = 0.0
    keep = [i for i in range(M) if i != drop]

    for fn in (masked_poe, stable_poe):
        mu_a, lv_a = fn(jnp.asarray(mus), jnp.asarray(lvs),
                        jnp.asarray(mask))
        mu_b, lv_b = fn(jnp.asarray(mus[keep]), jnp.asarray(lvs[keep]))
        np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(lv_a), np.asarray(lv_b),
                                   rtol=2e-4, atol=2e-5)


@settings(**SETTINGS)
@given(expert_stack())
def test_poe_formulations_agree(stack):
    """Precision-form poe == masked_poe(all-ones) == stable_poe, and the
    result matches the closed-form two-expert product."""
    mus, lvs = stack
    mu1, lv1 = poe(jnp.asarray(mus), jnp.asarray(lvs))
    mu2, lv2 = masked_poe(jnp.asarray(mus), jnp.asarray(lvs))
    mu3, lv3 = stable_poe(jnp.asarray(mus), jnp.asarray(lvs))
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu3),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lv2), np.asarray(lv3),
                               rtol=2e-3, atol=2e-4)
    # closed form: precision-weighted mean / inverse summed precision
    prec = 1.0 / np.exp(lvs)
    var = 1.0 / prec.sum(0)
    mu_ref = (mus * prec).sum(0) * var
    np.testing.assert_allclose(np.asarray(mu3), mu_ref, rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.exp(np.asarray(lv3)), var, rtol=2e-3,
                               atol=2e-4)


@settings(**SETTINGS)
@given(expert_stack())
def test_stable_poe_extreme_logvars_finite(stack):
    mus, lvs = stack
    lvs = lvs * 10.0  # log-vars in [-60, 40]: plain poe would over/underflow
    mu, lv = stable_poe(jnp.asarray(mus), jnp.asarray(lvs))
    assert np.isfinite(np.asarray(mu)).all()
    assert np.isfinite(np.asarray(lv)).all()


@settings(**SETTINGS)
@given(expert_stack())
def test_kl_matches_torch_distributions(stack):
    """Closed-form diagonal-Gaussian KL == torch.distributions oracle."""
    mus, lvs = stack
    q_mu, p_mu = mus[0], mus[1]
    q_lv, p_lv = lvs[0], lvs[1]
    ours = np.asarray(kl_divergence(
        jnp.asarray(q_mu), jnp.asarray(q_lv),
        jnp.asarray(p_mu), jnp.asarray(p_lv)))
    q = torch.distributions.Normal(
        torch.tensor(q_mu), torch.tensor(np.exp(0.5 * q_lv)))
    p = torch.distributions.Normal(
        torch.tensor(p_mu), torch.tensor(np.exp(0.5 * p_lv)))
    ref = torch.distributions.kl_divergence(q, p).sum(-1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)
    assert (ours >= -1e-4).all()  # KL is non-negative


@settings(**SETTINGS)
@given(st.integers(1, 4), st.integers(1, 6), st.integers(0, 10 ** 6))
def test_kl_zero_iff_same_distribution(B, D, seed):
    rng = np.random.default_rng(seed)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = rng.normal(size=(B, D)).astype(np.float32)
    zero = np.asarray(kl_divergence(jnp.asarray(mu), jnp.asarray(lv),
                                    jnp.asarray(mu), jnp.asarray(lv)))
    np.testing.assert_allclose(zero, 0.0, atol=1e-5)


@settings(**SETTINGS)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 10 ** 6))
def test_chunked_logsumexp_is_chunking_invariant(K, bs_K, seed):
    """For a chunk fn whose weights don't depend on the rng, ANY
    (K, batch_size_K) chunking — including a ragged remainder chunk —
    must reduce to exactly log(K) + logsumexp-free base value."""
    rng = np.random.default_rng(seed)
    B = 3
    base = jnp.asarray(rng.normal(size=(B,)).astype(np.float32) * 5)

    def chunk_lse(key, chunk_size):
        # chunk weights all equal to `base` -> per-chunk lse is
        # log(chunk_size) + base
        return jnp.log(float(chunk_size)) + base

    out = chunked_logsumexp(chunk_lse, jax.random.key(0), K=K,
                            batch_size_K=bs_K)
    ref = np.log(K) + np.asarray(base)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@settings(**SETTINGS)
@given(st.integers(1, 30), st.integers(1, 30), st.integers(0, 10 ** 6))
def test_iwae_log_marginal_equals_direct_estimator(K, bs_K, seed):
    """With rng-independent weights, the scan-chunked IWAE must equal the
    unchunked logsumexp(logw) - log(K) exactly, for any chunking incl.
    ragged remainders."""
    rng = np.random.default_rng(seed)
    B = 2
    base = rng.normal(size=(B,)).astype(np.float32) * 3

    def logw_chunk(key, chunk_size):
        return jnp.broadcast_to(jnp.asarray(base), (chunk_size, B))

    out = iwae_log_marginal(logw_chunk, jax.random.key(0), K=K,
                            batch_size_K=bs_K)
    # K identical weights: logsumexp - log K == the weight itself
    np.testing.assert_allclose(np.asarray(out), base, rtol=1e-5,
                               atol=1e-5)


@settings(**SETTINGS)
@given(st.integers(1, 6))
def test_all_subsets_mask_contract(M):
    mods = [f"m{i}" for i in range(M)]
    subsets = all_subsets(mods)
    assert len(subsets) == 2 ** M - 1
    assert len({tuple(s) for s in subsets}) == len(subsets)
    mask = np.asarray(subsets_to_mask(subsets, mods))
    assert mask.shape == (len(subsets), M)
    for row, s in zip(mask, subsets):
        np.testing.assert_array_equal(
            row, [1.0 if m in s else 0.0 for m in mods])


@settings(**SETTINGS)
@given(st.integers(1, 4), st.integers(1, 6), st.integers(0, 10 ** 6),
       st.floats(0.1, 3.0))
def test_decoder_log_probs_match_torch(B, D, seed, scale):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, D)).astype(np.float32)
    target = rng.normal(size=(B, D)).astype(np.float32)
    binary = (rng.random((B, D)) > 0.5).astype(np.float32)

    ours = np.asarray(normal_log_prob(jnp.asarray(x), jnp.asarray(target),
                                      scale=scale))
    ref = torch.distributions.Normal(
        torch.tensor(x), scale).log_prob(torch.tensor(target)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    ours = np.asarray(laplace_log_prob(jnp.asarray(x), jnp.asarray(target),
                                       scale=scale))
    ref = torch.distributions.Laplace(
        torch.tensor(x), scale).log_prob(torch.tensor(target)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    ours = np.asarray(bernoulli_logits_log_prob(jnp.asarray(x),
                                                jnp.asarray(binary)))
    ref = torch.distributions.Bernoulli(
        logits=torch.tensor(x)).log_prob(torch.tensor(binary)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@settings(**SETTINGS)
@given(st.integers(1, 4), st.integers(1, 6), st.integers(2, 5),
       st.integers(0, 10 ** 6))
def test_rsample_contracts(B, D, N, seed):
    rng = np.random.default_rng(seed)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = rng.normal(size=(B, D)).astype(np.float32)
    key = jax.random.key(seed)

    mean = rsample_from_gaussian(key, jnp.asarray(mu), jnp.asarray(lv),
                                 return_mean=True)
    np.testing.assert_allclose(np.asarray(mean), mu, atol=1e-6)

    z1 = rsample_from_gaussian(key, jnp.asarray(mu), jnp.asarray(lv))
    assert z1.shape == (B, D)
    zN = rsample_from_gaussian(key, jnp.asarray(mu), jnp.asarray(lv), N=N)
    assert zN.shape == (N, B, D)
    zF = rsample_from_gaussian(key, jnp.asarray(mu), jnp.asarray(lv), N=N,
                               flatten=True)
    assert zF.shape == (N * B, D)
    np.testing.assert_allclose(np.asarray(zF),
                               np.asarray(zN).reshape(N * B, D), atol=1e-6)
