"""Chunked importance-weighted marginal-likelihood estimation.

The reference estimates ln p(X) with K=1000 importance samples in a nested
host loop over datapoints and K-chunks
(``src/multivae/models/mvtcae/mvtcae_model.py:250-289`` and equivalents in
every model) — the wall-clock bottleneck called out in SURVEY §3.4. Here the
chunking is a ``lax.scan`` over K-chunks with the whole batch processed at
once per chunk, so the entire estimator is one compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def iwae_log_marginal(logw_chunk_fn, rng, K: int, batch_size_K: int):
    """Estimate log(1/K sum_k w_k) per batch element with chunked sampling.

    Args:
        logw_chunk_fn: callable ``(rng, chunk_size) -> (chunk_size, B) log
            importance weights`` (log p(x, z_k) - log q(z_k)). Must be pure
            and jittable; ``chunk_size`` is static.
        rng: PRNG key.
        K: total number of importance samples.
        batch_size_K: samples per chunk.

    Returns:
        (B,) array of log-marginal estimates: logsumexp_k(log w_k) - log K.
    """
    batch_size_K = min(batch_size_K, K)
    n_full = K // batch_size_K
    remainder = K - n_full * batch_size_K

    partial_lses = []
    if n_full > 0:
        def body(carry_rng, _):
            carry_rng, sub = jax.random.split(carry_rng)
            lw = logw_chunk_fn(sub, batch_size_K)
            return carry_rng, jax.nn.logsumexp(lw, axis=0)

        rng, chunk_lses = lax.scan(body, rng, None, length=n_full)
        partial_lses.append(chunk_lses)  # (n_full, B)

    if remainder > 0:
        rng, sub = jax.random.split(rng)
        lw = logw_chunk_fn(sub, remainder)
        partial_lses.append(jax.nn.logsumexp(lw, axis=0)[None])

    all_lse = jnp.concatenate(partial_lses, axis=0)
    return jax.nn.logsumexp(all_lse, axis=0) - jnp.log(
        jnp.asarray(K, jnp.float32)
    )


def chunked_logsumexp(chunk_lse_fn, rng, K: int, batch_size_K: int):
    """Combine per-chunk logsumexp estimates over K total samples.

    For estimators whose chunk computation already collapses the sample
    axis (e.g. MMVAE's ``_iwae`` which logsumexps over modalities AND
    samples), ``iwae_log_marginal`` doesn't fit; this variant scans over
    chunks of *pre-reduced* values instead of raw weights. All full chunks
    run under one ``lax.scan`` so the compiled graph holds a single chunk
    body regardless of K/batch_size_K (VERDICT r1 item 7: the previous
    Python while-loop inlined K/batch_size_K copies).

    Args:
        chunk_lse_fn: callable ``(rng, chunk_size) -> (B,)`` returning the
            UNNORMALIZED logsumexp of that chunk's importance weights
            (``chunk_size`` is static). Must be pure and jittable.
        rng: PRNG key.
        K: total number of samples across chunks.
        batch_size_K: samples per chunk.

    Returns:
        (B,) logsumexp over all K chunked weights (caller subtracts its own
        normalization, e.g. ``log(K * n_modalities)``).
    """
    batch_size_K = min(batch_size_K, K)
    n_full = K // batch_size_K
    remainder = K - n_full * batch_size_K

    parts = []
    if n_full > 0:
        def body(carry_rng, _):
            carry_rng, sub = jax.random.split(carry_rng)
            return carry_rng, chunk_lse_fn(sub, batch_size_K)

        rng, chunk_lses = lax.scan(body, rng, None, length=n_full)
        parts.append(chunk_lses)  # (n_full, B)

    if remainder > 0:
        rng, sub = jax.random.split(rng)
        parts.append(chunk_lse_fn(sub, remainder)[None])

    return jax.nn.logsumexp(jnp.concatenate(parts, axis=0), axis=0)
