"""Microbatched gradient accumulation: trade remat FLOPs for a scan.

The memory-hungry objectives in this library are the K-sample ones
(MMVAE / MMVAE+ / CMVAE): their decoder activations scale as
``M x K x B`` and at the flagship MMVAE+ resnet scale (M=5, K=10,
B=256, bf16) need ~21 GB — past the 15.75 GB v5e chip — which
``use_remat`` solves by recomputing the whole forward in the backward
pass (4 forward-equivalents of FLOPs per step instead of 3; measured
1.29x step-time overhead).

These objectives are all SUM reductions over the batch
(``loss == loss_sum``; per-sample terms are independent), so the exact
same gradients can be computed by scanning over B-microbatches with NO
rematerialization: each chunk's forward activations live only for that
chunk's backward, peak memory drops by the microbatch factor, and the
step pays the ideal 3 forward-equivalents. Measured on the flagship
config: 944 ms/step (remat) -> see ``bench.py`` microbatch row.

Not applicable to mean-reduction losses with data-dependent
normalizers (e.g. MVAE's effective-sample count): accumulating
chunk-sums is only exact when the full-batch loss is the sum of the
chunk losses. Every K-sample model here satisfies that.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def split_batch(batch, n_micro: int):
    """Reshape every array leaf ``(B, ...) -> (n_micro, B/n_micro, ...)``
    so ``lax.scan`` can carry the chunks. Static pytree metadata (e.g.
    ``MultimodalBatch.incomplete``) passes through untouched."""
    def _split(x):
        b = x.shape[0]
        if b % n_micro:
            raise ValueError(
                f"batch axis {b} not divisible by n_micro={n_micro}")
        return x.reshape(n_micro, b // n_micro, *x.shape[1:])

    return jax.tree.map(_split, batch)


def microbatched_value_and_grad(loss_sum_fn: Callable, n_micro: int):
    """``value_and_grad`` of a SUM-reduction loss, accumulated over
    ``n_micro`` batch chunks in one compiled scan.

    Args:
        loss_sum_fn: ``(params, batch, rng) -> scalar`` summing
            per-sample losses over the batch axis.
        n_micro: number of microbatches (must divide the batch size).

    Returns:
        ``fn(params, batch, rng) -> (loss, grads)`` with ``loss`` and
        ``grads`` mathematically equal to the full-batch call (up to
        fp accumulation order); each chunk consumes
        ``jax.random.fold_in(rng, chunk_index)`` so sampling-based
        objectives draw independent noise per chunk, exactly as a
        full-batch call draws independent noise per sample. Gradients
        accumulate in float32.
    """
    if n_micro < 1:
        raise ValueError(f"n_micro must be >= 1, got {n_micro}")

    def fn(params, batch, rng):
        if n_micro == 1:
            return jax.value_and_grad(loss_sum_fn)(params, batch, rng)
        chunks = split_batch(batch, n_micro)
        vg = jax.value_and_grad(loss_sum_fn)

        def body(carry, idx_chunk):
            idx, chunk = idx_chunk
            loss_acc, grad_acc = carry
            loss, grads = vg(params, chunk, jax.random.fold_in(rng, idx))
            grad_acc = jax.tree.map(
                lambda a, g: a + g.astype(a.dtype), grad_acc, grads)
            return (loss_acc + loss.astype(jnp.float32), grad_acc), None

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        (loss, grads), _ = lax.scan(
            body, (jnp.float32(0.0), zeros),
            (jnp.arange(n_micro), chunks))
        return loss, grads

    return fn
