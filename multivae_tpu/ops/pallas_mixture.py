"""Fused masked mixture log-density Pallas kernel.

The hottest non-matmul op of the MoE family (MMVAE/MMVAE+/CMVAE) is the
mixture-of-experts density

    out[z, k, b] = logsumexp_q [ mask[q, b] ? sum_d log f(Z[z,k,b,d];
                                 mu[q,b,d], sig[q,b,d]) : -inf ]

XLA materializes the (MQ, MZ, K, B, D) broadcast (131 MB at the PolyMNIST
benchmark scale) before reducing; measured ~0.6 ms/op vs a ~0.04 ms IO
roofline on v5e. This kernel streams experts through VMEM with a running
logsumexp over a batch-tiled grid, never materializing the product. A
custom VJP recomputes the per-expert densities in the backward kernel
(cheap) and accumulates dz / dmu / dsig in one pass.

Two tricks keep the inner loop on 1-cycle VPU ops:
  * all transcendental prep is hoisted to XLA: the kernel receives
    inv_sig = 1/sig and a per-(batch, expert) constant folding the
    log-normalizer sum_d log(sig) + D*log_const and the mask bias
    (-1e30 for missing experts), so the loop is sub/abs/mul/reduce only;
  * the small per-batch arrays (constant, out, cotangent) are passed
    TRANSPOSED as (B, rows), putting the batch axis on sublanes so a
    (tb, rows) block satisfies the Mosaic tiling rule (tb % 8 == 0,
    rows == full dim) without in-kernel dynamic lane slicing.

Measured on a v5e chip (2026-08): isolated, the kernel edges out XLA
(0.32 vs 0.33 ms fwd at MQ=MZ=5, K=10, B=256, D=512 — ~70% of the
achievable ~140 GB/s streaming roofline measured on this part). Inside
the full MMVAE dreg_looser train step, however, the opaque custom call
defeats XLA's CSE of the DReG double evaluation and its producer fusion:
26.9 ms/step with the kernel vs 8.3 ms/step with the XLA composition.
The dispatcher therefore defaults to the XLA path; set
``MULTIVAE_TPU_PALLAS_MIXTURE=1`` to opt in (e.g. for standalone density
evaluation where the 131 MB intermediate matters more than fusion).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_LOG2 = math.log(2.0)
_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
_NEG = -1e30

# test hook: when True, pallas_call runs in interpret mode (works on CPU)
_INTERPRET = False


def _logf_terms(dist: str, z, mu, sig):
    """Elementwise log-density terms (broadcasted)."""
    if dist == "laplace":
        return -jnp.abs(z - mu) / sig - jnp.log(sig) - _LOG2
    return -0.5 * ((z - mu) / sig) ** 2 - jnp.log(sig) - _HALF_LOG_2PI


def mixture_log_density_xla(z, mus, sigmas, mask, dist: str = "laplace"):
    """Reference XLA composition: (MZ,K,B,D),(MQ,B,D),(MQ,B,D),(MQ,B) ->
    (MZ,K,B)."""
    lq = _logf_terms(dist, z[None], mus[:, None, None],
                     sigmas[:, None, None]).sum(-1, dtype=jnp.float32)
    lq = jnp.where(mask[:, None, None, :] > 0, lq, _NEG)
    return jax.nn.logsumexp(lq, axis=0)


# --------------------------------------------------------------------------
# Pallas kernels
# --------------------------------------------------------------------------

def _quad(dist: str, z, mu, inv_sig):
    """The data-dependent part of log f; everything else is in const_t."""
    if dist == "laplace":
        return -(jnp.abs(z - mu) * inv_sig).sum(-1)
    u = (z - mu) * inv_sig
    return -0.5 * (u * u).sum(-1)


def _fwd_kernel(z_ref, mu_ref, isig_ref, const_t_ref, out_t_ref, *,
                mq: int, tb: int, dist: str):
    z = z_ref[:]                      # (R, TB, D)
    r = z.shape[0]
    m_run = jnp.full((r, tb), _NEG, jnp.float32)
    s_run = jnp.zeros((r, tb), jnp.float32)
    const_t = const_t_ref[:]          # (TB, MQ): -sum log sig - bias
    for q in range(mq):               # static unroll over experts
        lq = _quad(dist, z, mu_ref[q][None], isig_ref[q][None])  # (R, TB)
        lq = lq + const_t[:, q][None, :]
        m_new = jnp.maximum(m_run, lq)
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.exp(lq - m_new)
        m_run = m_new
    out_t_ref[:] = (jnp.log(s_run) + m_run).T   # (TB, R)


def _bwd_kernel(z_ref, mu_ref, isig_ref, const_t_ref, out_t_ref, g_t_ref,
                dz_ref, dmu_ref, dsig_ref, *, mq: int, tb: int, dist: str):
    z = z_ref[:]                      # (R, TB, D)
    out = out_t_ref[:].T              # (R, TB)
    g = g_t_ref[:].T                  # (R, TB)
    const_t = const_t_ref[:]          # (TB, MQ)
    dz = jnp.zeros_like(z)
    for q in range(mq):
        mu = mu_ref[q][None]          # (1, TB, D)
        inv_sig = isig_ref[q][None]
        diff = z - mu
        lq = _quad(dist, z, mu, inv_sig) + const_t[:, q][None, :]
        w = jnp.exp(lq - out) * g     # (R, TB): softmax weight x cotangent
        if dist == "laplace":
            # explicit select: jnp.sign miscompiles under Mosaic here
            sgn = jnp.where(diff >= 0, 1.0, -1.0)
            df_dz = -sgn * inv_sig
            df_dsig = (jnp.abs(diff) * inv_sig - 1.0) * inv_sig
        else:
            df_dz = -diff * inv_sig * inv_sig
            df_dsig = (diff * diff * inv_sig * inv_sig - 1.0) * inv_sig
        wz = w[..., None] * df_dz     # (R, TB, D)
        dz = dz + wz
        dmu_ref[q] = -wz.sum(axis=0)  # df/dmu = -df/dz
        dsig_ref[q] = (w[..., None] * df_dsig).sum(axis=0)
    dz_ref[:] = dz


def _pick_tile(b: int, r: int = 1, mq: int = 1, d: int = 128,
               budget_bytes: int = 8 * 1024 * 1024) -> int:
    """Largest batch tile whose working set fits the VMEM budget.

    Working set per batch element ~ (R + 2*MQ) operand floats x D plus a
    couple of (R, D) temporaries inside the expert loop.
    """
    unit = (r + 2 * mq + 2 * r) * d * 4  # bytes per batch element
    for tb in (128, 64, 32, 16, 8):
        if b % tb == 0 and tb * unit <= budget_bytes:
            return tb
    return 0


def _pallas_supported(z, mus, b_tile: int) -> bool:
    import os

    if os.environ.get("MULTIVAE_TPU_PALLAS_MIXTURE", "0") != "1":
        return False
    if b_tile == 0:
        return False
    if z.shape[-1] % 128 != 0 or z.shape[2] % 128 != 0:
        return False
    if z.dtype != jnp.float32 or mus.dtype != jnp.float32:
        return False
    return jax.default_backend() == "tpu"


def _const_t(sigmas, mask, d: int, dist: str):
    """(B, MQ) per-expert constant: -sum_d log sig - D*c, -1e30 if masked."""
    c = _LOG2 if dist == "laplace" else _HALF_LOG_2PI
    const = -jnp.log(sigmas).sum(-1, dtype=jnp.float32) - d * c  # (MQ, B)
    return jnp.where(mask > 0, const, _NEG).T       # (B, MQ)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _mixture_pallas(z4, mus, sigmas, mask, dist):
    return _mixture_pallas_fwd_impl(z4, mus, sigmas, mask, dist)


def _call_fwd(z3, mus, inv_sig, const_t, dist):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, b, d = z3.shape
    mq = mus.shape[0]
    tb = _pick_tile(b, r=r, mq=mq, d=d)
    grid = (b // tb,)
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel, mq=mq, tb=tb, dist=dist),
        out_shape=jax.ShapeDtypeStruct((b, r), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mq, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mq, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            # transposed small arrays: batch on the sublane axis
            pl.BlockSpec((tb, mq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, r), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(z3, mus, inv_sig, const_t)
    return out_t.T


def _call_bwd(z3, mus, inv_sig, const_t, out, g, dist):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, b, d = z3.shape
    mq = mus.shape[0]
    tb = _pick_tile(b, r=r, mq=mq, d=d)
    grid = (b // tb,)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, mq=mq, tb=tb, dist=dist),
        out_shape=(
            jax.ShapeDtypeStruct((r, b, d), jnp.float32),
            jax.ShapeDtypeStruct((mq, b, d), jnp.float32),
            jax.ShapeDtypeStruct((mq, b, d), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mq, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mq, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, mq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((r, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mq, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mq, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=_INTERPRET,
    )(z3, mus, inv_sig, const_t, out.T, g.T)


def _mixture_pallas_fwd_impl(z4, mus, sigmas, mask, dist):
    mz, k, b, d = z4.shape
    z3 = z4.reshape(mz * k, b, d)
    out = _call_fwd(z3, mus, 1.0 / sigmas, _const_t(sigmas, mask, d, dist),
                    dist)
    return out.reshape(mz, k, b)


def _mixture_pallas_fwd(z4, mus, sigmas, mask, dist):
    out = _mixture_pallas_fwd_impl(z4, mus, sigmas, mask, dist)
    return out, (z4, mus, sigmas, mask, out)


def _mixture_pallas_bwd(dist, residuals, g):
    z4, mus, sigmas, mask, out = residuals
    mz, k, b, d = z4.shape
    z3 = z4.reshape(mz * k, b, d)
    dz, dmu, dsig = _call_bwd(
        z3, mus, 1.0 / sigmas, _const_t(sigmas, mask, d, dist),
        out.reshape(mz * k, b), g.reshape(mz * k, b), dist,
    )
    return dz.reshape(mz, k, b, d), dmu, dsig, jnp.zeros_like(mask)


_mixture_pallas.defvjp(_mixture_pallas_fwd, _mixture_pallas_bwd)


def mixture_log_density(z, mus, sigmas, mask, dist: str = "laplace"):
    """Fused mixture log-density with automatic Pallas/XLA dispatch.

    Args:
        z: (MZ, K, B, D) samples.
        mus / sigmas: (MQ, B, D) expert params.
        mask: (MQ, B) availability (0 experts are excluded).
        dist: 'laplace' or 'normal'.

    Returns:
        (MZ, K, B) logsumexp over experts (NOT divided by the expert count).
    """
    mz, k = z.shape[0], z.shape[1]
    tile = _pick_tile(z.shape[2], r=mz * k, mq=mus.shape[0], d=z.shape[3])
    if _pallas_supported(z, mus, tile):
        return _mixture_pallas(z, mus, sigmas, mask, dist)
    return mixture_log_density_xla(z, mus, sigmas, mask, dist)
