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


def microbatched_value_and_grad(loss_sum_fn: Callable, n_micro: int,
                                has_aux: bool = False):
    """``value_and_grad`` of a SUM-reduction loss, accumulated over
    ``n_micro`` batch chunks in one compiled scan.

    Args:
        loss_sum_fn: ``(params, batch, rng) -> scalar`` summing
            per-sample losses over the batch axis; with
            ``has_aux=True``, ``-> (scalar, aux_tree)``.
        n_micro: number of microbatches (must divide the batch size).
        has_aux: when True, the auxiliary tree's float leaves are
            accumulated as the MEAN over the (equal-size) chunks, so
            mean-semantic per-batch metrics stay comparable to a
            full-batch call; the return becomes
            ``((loss, aux), grads)`` like ``jax.value_and_grad``'s.

    Returns:
        ``fn(params, batch, rng) -> (loss, grads)`` (or
        ``((loss, aux), grads)``) with ``loss`` and ``grads``
        mathematically equal to the full-batch call (up to fp
        accumulation order); each chunk consumes
        ``jax.random.fold_in(rng, chunk_index)`` so sampling-based
        objectives draw independent noise per chunk, exactly as a
        full-batch call draws independent noise per sample. Gradients
        accumulate in float32.
    """
    if n_micro < 1:
        raise ValueError(f"n_micro must be >= 1, got {n_micro}")

    def fn(params, batch, rng):
        if n_micro == 1:
            return jax.value_and_grad(loss_sum_fn, has_aux=has_aux)(
                params, batch, rng)
        chunks = split_batch(batch, n_micro)
        vg = jax.value_and_grad(loss_sum_fn, has_aux=has_aux)

        def body(carry, idx_chunk):
            idx, chunk = idx_chunk
            loss_acc, aux_acc, grad_acc = carry
            val, grads = vg(params, chunk, jax.random.fold_in(rng, idx))
            loss, aux = val if has_aux else (val, None)
            grad_acc = jax.tree.map(
                lambda a, g: a + g.astype(a.dtype), grad_acc, grads)
            if has_aux:
                aux_acc = jax.tree.map(
                    lambda a, v: a + jnp.asarray(v, jnp.float32) / n_micro,
                    aux_acc, aux)
            return (loss_acc + loss.astype(jnp.float32), aux_acc,
                    grad_acc), None

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        aux_zeros = None
        if has_aux:
            chunk0 = jax.tree.map(lambda x: x[0], chunks)
            aux_shapes = jax.eval_shape(
                lambda: loss_sum_fn(params, chunk0, rng)[1])
            aux_zeros = jax.tree.map(
                lambda s: jnp.zeros(s.shape, jnp.float32), aux_shapes)
        (loss, aux, grads), _ = lax.scan(
            body, (jnp.float32(0.0), aux_zeros, zeros),
            (jnp.arange(n_micro), chunks))
        return ((loss, aux), grads) if has_aux else (loss, grads)

    return fn
