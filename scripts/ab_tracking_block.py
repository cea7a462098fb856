"""A/B for the BEST-TRACKING fused block: nested scan (current) vs a
Python-unrolled outer loop (depth top-level scans + epoch-boundary
selects, no while-in-while).

The r5 flat rewrite fixed the plain block (nested scans run the step
body 1.42x slower on the v5e than one flat scan), but the tracking
variant kept the nested shape because its per-epoch params select
would cost per step in a flat scan. An UNROLLED outer loop keeps every
inner scan top-level (chunk-rate bodies) while paying the select once
per epoch — the open question is compile time, since the epoch body is
cloned depth times in the HLO. This script measures both programs'
compile wall time and steady-state device rate on the real chip.

Run (idle TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_tracking_block.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

LATENT, BATCH = 512, 256
DIMS = {"m0": (1, 28, 28), "m1": (3, 32, 32)}
STEPS_PER_EPOCH, DEPTH = 200, 8


def time_chain(fn, state, best, rest, n_calls):
    out = fn(state, best, *rest)
    jax.block_until_ready(out[2])
    state, best = out[0], out[1]
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = fn(state, best, *rest)
        state, best = out[0], out[1]
    _ = float(np.asarray(out[2]).ravel()[0])
    return time.perf_counter() - t0, state, best


def main():
    rng = np.random.default_rng(0)
    data = {m: rng.uniform(size=(BATCH * STEPS_PER_EPOCH, *d))
            .astype(np.float32) for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    model = MVTCAE(MVTCAEConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
        decoders_dist={m: "bernoulli" for m in DIMS},
    ), seed=0)
    cfg = BaseTrainerConfig(
        output_dir="/tmp/ab_track", num_epochs=DEPTH * 4,
        per_device_train_batch_size=BATCH,
        per_device_eval_batch_size=BATCH, learning_rate=1e-3, seed=0,
        n_devices=1, cache_on_device=True, pipeline_depth=DEPTH,
        steps_per_execution=STEPS_PER_EPOCH, keep_best_on_train=True,
    )
    trainer = BaseTrainer(model, ds, training_config=cfg)
    assert trainer._block_best_tracking

    trainer.train_loader.set_epoch(1)
    idx = np.asarray(trainer._cache_plan_rows(trainer.train_loader))
    idx_block = jnp.asarray(np.stack([idx] * DEPTH))
    best = trainer._init_block_best_carry()
    state = trainer.state
    rest = (trainer._train_cache, idx_block, np.float32(1.0))

    # --- nested (current)
    t0 = time.perf_counter()
    nested = trainer._compiled_cached_train_block(DEPTH)
    out = nested(state, best, *rest)
    jax.block_until_ready(out[2])
    c_nested = time.perf_counter() - t0
    state, best = out[0], out[1]
    t_nested, state, best = time_chain(nested, state, best, rest, 3)
    t_nested /= 3 * DEPTH * STEPS_PER_EPOCH

    # --- unrolled: depth top-level scans + per-epoch selects
    window_fn = trainer._train_window_fn(STEPS_PER_EPOCH)
    kbt = True
    warm_until = float(trainer.start_keep_best_epoch)
    n_data = float(len(ds))

    def epoch_tail(best_carry, st, epoch, packed):
        best_loss, best_params = best_carry
        loss = packed[0] / jnp.float32(n_data)
        warm = epoch <= jnp.float32(warm_until)
        improved = jnp.logical_and(epoch > jnp.float32(warm_until),
                                   loss < best_loss) if kbt else (
            jnp.zeros((), jnp.bool_))
        took = jnp.logical_or(warm, improved)
        best_loss = jnp.where(improved, loss, best_loss)
        best_params = jax.tree.map(
            lambda p, bp: jnp.where(took, p, bp), st.params, best_params)
        return (best_loss, best_params), took

    def unrolled_fn(st, best_carry, cache, idx_blk, first_epoch):
        rows = []
        for e in range(DEPTH):
            epoch = first_epoch + jnp.float32(e)
            st, sums, packed = window_fn(
                st, cache, idx_blk[e], jnp.int32(0), epoch)
            best_carry, took = epoch_tail(best_carry, st, epoch, packed)
            rows.append(jnp.concatenate(
                [packed, took.astype(jnp.float32)[None]]))
        return st, best_carry, jnp.stack(rows)

    unrolled = jax.jit(unrolled_fn, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    out = unrolled(state, best, *rest)
    jax.block_until_ready(out[2])
    c_unrolled = time.perf_counter() - t0
    state, best = out[0], out[1]
    t_unrolled, state, best = time_chain(unrolled, state, best, rest, 3)
    t_unrolled /= 3 * DEPTH * STEPS_PER_EPOCH

    print(f"nested   : compile+first {c_nested:6.1f} s   "
          f"{t_nested * 1e6:8.1f} us/step")
    print(f"unrolled : compile+first {c_unrolled:6.1f} s   "
          f"{t_unrolled * 1e6:8.1f} us/step")
    print(f"unrolled/nested rate: {t_unrolled / t_nested:.3f}   "
          f"compile ratio: {c_unrolled / c_nested:.2f}")


if __name__ == "__main__":
    main()
