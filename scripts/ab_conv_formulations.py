"""Isolated A/B of the flagship decoder's hot conv block formulations.

The MMVAE+ resnet step is decode-dominated (scripts/profile_mmvaeplus.py:
decode fwd+bwd 515 ms of the 538 ms step) and the decoder's 28x28
ResnetBlock(64, 64) holds ~55% of its MACs with only 64 output
channels — half of a 128-lane MXU tile. Hypothesis: that block is
lane-bound, and a space-to-depth reformulation (28,28,64)->(14,14,256)
with an exactly-rearranged kernel fills the lanes.

Measures, on the real chip (bf16, N = M*K*B/2 = 6400 rows, the
per-microbatch flagship shape):
  a) conv64:   3x3 conv 64->64 @ 28x28            (the current block)
  b) conv128:  3x3 conv 128->128 @ 28x28          (lane-full control)
  c) s2d_conv: the space-to-depth-equivalent of (a)
  d) big matmul control (the chip's effective bf16 peak through the
     tunnel)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=8, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    print(f"{label:28s} {dt * 1e3:9.3f} ms  {flops / dt / 1e12:7.2f} TF/s"
          f"  ({flops / 1e12:.3f} TF)")
    return dt


def conv(x, k):
    # keep operands AND cotangents bf16 (an fp32 preferred_element_type
    # output makes the backward conv see mixed dtypes and fail)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x):
    """(N, 2H', 2W', C) -> (N, H', W', 4C), phase-major."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        n, h // 2, w // 2, 4 * c)


def d2s(y):
    n, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, h, w, 2, 2, c)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
        n, 2 * h, 2 * w, c)


def s2d_kernel(k):
    """Rearrange a 3x3 (HWIO) C->C kernel into the 4x4 (4C)->(4C)
    kernel that computes the SAME conv on the space-to-depth layout.

    Output phase (a,b) at coarse (i,j) needs input taps
    (2i+a+u-1, 2j+b+v-1) for u,v in 0..2 -> coarse offsets in {-1,0,1}
    per axis once folded by phase, i.e. a 4x4 coarse kernel indexed by
    (input phase, output phase) with zeros where the tap pattern
    doesn't reach."""
    kh, kw, ci, co = k.shape
    assert kh == kw == 3
    big = np.zeros((3, 3, 4 * ci, 4 * co), k.dtype)
    # fine-grid relation: out_fine = 2*i + a; tap reads in_fine =
    # out_fine + u - 1 = 2*i + a + u - 1. Write in coarse coords:
    # in_fine = 2*(i + q) + p  with p = (a + u - 1) % 2,
    # q = (a + u - 1) // 2 in {-1, 0, 1} -> coarse kernel tap q + 1
    # with SAME padding. NOTE: only 6 of the 12 (tap, p, a) cells per
    # axis are populated -> the dense coarse kernel is 3/4 zeros and
    # the dense coarse conv does 4x the fine conv's FLOPs. This is the
    # REJECTION argument: lane fill can win at most 2x.
    for a in range(2):
        for b in range(2):
            for u in range(3):
                for v in range(3):
                    p, q = (a + u - 1) % 2, (a + u - 1) // 2
                    r, s = (b + v - 1) % 2, (b + v - 1) // 2
                    big[q + 1, s + 1,
                        (p * 2 + r) * ci:(p * 2 + r + 1) * ci,
                        (a * 2 + b) * co:(a * 2 + b + 1) * co] = k[u, v]
    return jnp.asarray(big)


def conv_s2d_equiv(x, big_k):
    """SAME 3x3 fine conv computed as a SAME 3x3 coarse conv on the
    space-to-depth layout with the phase-folded (3/4-zeros) kernel."""
    y = jax.lax.conv_general_dilated(
        s2d(x), big_k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return d2s(y)


def main():
    print(f"device={jax.devices()[0]}")
    rng = np.random.default_rng(0)
    N = 6400  # M*K*B/2: flagship per-microbatch decode rows

    x64 = jnp.asarray(rng.normal(size=(N, 28, 28, 64)), jnp.bfloat16)
    k64 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    x128 = jnp.asarray(rng.normal(size=(N, 28, 28, 128)), jnp.bfloat16)
    k128 = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05,
                       jnp.bfloat16)

    # correctness of the s2d equivalence (fp32 on small input)
    xs = jnp.asarray(rng.normal(size=(2, 28, 28, 64)), jnp.float32)
    ks = jnp.asarray(rng.normal(size=(3, 3, 64, 64)), jnp.float32)

    def conv32(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = conv32(xs, ks)
    got = jax.lax.conv_general_dilated(
        s2d(xs), jnp.asarray(s2d_kernel(np.asarray(ks))), (1, 1),
        "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = d2s(got)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"s2d equivalence max|err| = {err:.3e}")
    assert err < 1e-3, err

    cf = jax.jit(conv)
    timed(cf, x64, k64, label="conv 3x3 64->64 @28^2")
    timed(cf, x128, k128, label="conv 3x3 128->128 @28^2")

    bk = s2d_kernel(np.asarray(k64, np.float32)).astype(jnp.bfloat16)
    cs = jax.jit(conv_s2d_equiv)
    timed(cs, x64, bk, label="s2d-equiv 4x4 256->256 @14^2")

    # grad versions (the step is fwd+bwd)
    def loss_c(x, k):
        return jnp.sum(conv(x, k).astype(jnp.float32))

    def loss_s(x, k):
        return jnp.sum(conv_s2d_equiv(x, k).astype(jnp.float32))

    gc = jax.jit(jax.grad(loss_c, argnums=(0, 1)))
    gs = jax.jit(jax.grad(loss_s, argnums=(0, 1)))
    timed(gc, x64, k64, label="grad conv64")
    timed(gc, x128, k128, label="grad conv128")
    timed(gs, x64, bk, label="grad s2d-equiv")

    # effective bf16 matmul peak through the tunnel
    a = jnp.asarray(rng.normal(size=(8192, 8192)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(8192, 8192)), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    timed(mm, a, b, label="matmul 8192^3 bf16")


if __name__ == "__main__":
    main()
