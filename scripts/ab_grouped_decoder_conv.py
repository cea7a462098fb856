"""A/B: can vmapping the M per-modality decoders fill the 128-lane MXU?

The MMVAE+ flagship step is decode-bound (r4 phase profile): the 28x28
``ResnetBlock(64, 64)`` runs with 64 output channels — half the 128
TPU lanes — and the protocol fixes nf=64
(``/root/reference/examples/.../global_config.py``). The M decoders are
applied SEQUENTIALLY today (one call per recon modality, each over
(M*K*B) rows). This measures whether batching the M applications with
``jax.vmap`` over STACKED decoder params (which XLA lowers to
feature_group_count=M grouped convolutions, 5x64=320 total channels)
improves lane utilization, vs the sequential formulation.

Run on the real chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_grouped_decoder_conv.py

RESULT (v5e-1, 2026-08-20, B=96): grouped is SLOWER — 78.6 vs 74.1 ms
forward (0.94x), 202.3 vs 194.2 ms fwd+bwd (0.96x). XLA's
feature-grouped convolution lowering does not recover the 64-of-128
lane padding on this hardware; the r4 conclusion stands (the flagship
decode is structurally bound by the protocol's nf=64 at 28x28, and the
third measured rewrite — after space-to-depth and channel-packing math
— is also rejected). Keep the sequential per-modality decoder calls.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from multivae_tpu.nn.mmnist import DecoderResnetMMNIST

M, K, B, D = 5, 10, 96, 512  # B shrunk vs the protocol's 256: the full
# fwd+bwd of 5 un-rematerialized decoders OOMs one chip; per-channel
# lane utilization (the question here) is batch-size independent once
# the MXU is saturated (6k rows of 28x28 conv are plenty)
DTYPE = jnp.bfloat16


def main():
    rows = M * K * B  # rows each decoder processes (MMVAE+ cross decode)
    decoder = DecoderResnetMMNIST(latent_dim=D)

    # init on the host CPU backend (each flax Module.init is its own
    # compile — ~14 s per module through the TPU tunnel), then move
    # UNCOMMITTED (committed inputs fall off the axon fast path)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        z_h = jax.random.normal(jax.random.key(9), (rows, D))
        params = [
            decoder.init(jax.random.key(i),
                         jnp.zeros((2, D), DTYPE))["params"]
            for i in range(M)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)

    def put(t):
        return jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x), dtype=DTYPE), t)

    z = put(z_h)
    params = [put(p) for p in params]
    stacked = put(stacked)

    def one(p, zz):
        return decoder.apply({"params": p}, zz).reconstruction

    @jax.jit
    def sequential(ps, zz):
        outs = [one(p, zz) for p in ps]
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    @jax.jit
    def grouped(ps, zz):
        outs = jax.vmap(one, in_axes=(0, None))(ps, zz)
        return jnp.sum(outs.astype(jnp.float32))

    def bench(fn, args, n=8, tag=""):
        r = fn(*args)
        float(r)  # compile + settle
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        float(r)
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {dt * 1e3:.2f} ms/apply-set")
        return dt

    t_seq = bench(sequential, (params, z), tag="sequential M decoders")
    t_grp = bench(grouped, (stacked, z), tag="vmapped (grouped conv)")
    print(f"grouped/sequential speedup: {t_seq / t_grp:.3f}x")

    # forward+backward (the step cost is fwd+bwd)
    @jax.jit
    def seq_grad(ps, zz):
        return jax.grad(lambda p: sequential(p, zz))(ps)

    @jax.jit
    def grp_grad(ps, zz):
        return jax.grad(lambda p: grouped(p, zz))(ps)

    def bench_tree(fn, args, n=6, tag=""):
        g = fn(*args)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(n):
            g = fn(*args)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {dt * 1e3:.2f} ms/grad-set")
        return dt

    t_seq_g = bench_tree(seq_grad, (params, z), tag="sequential grad")
    t_grp_g = bench_tree(grp_grad, (stacked, z), tag="vmapped grad")
    print(f"grouped/sequential grad speedup: {t_seq_g / t_grp_g:.3f}x")


if __name__ == "__main__":
    main()
