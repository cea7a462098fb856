"""A/B: per-step device time of the fused-block/chunk programs vs the
bare scan-of-20 step (bench.py's ``bench_jax``), same shapes, one
process. VERDICT r4 weak #1 follow-up: the phase profile showed the e2e
residual is NOT host overhead (~3 ms/epoch total) — the block program's
own device rate trails the bare step. This isolates where:

  bare      scan(20) of the step body on ONE fixed resident batch
  nogather  scan(200) of the trainer's step body, fixed batch (no cache)
  chunk     the trainer's real 200-step cached-gather chunk program
  block     the trainer's real depth-8 whole-epoch block program

Run on the TPU (idle machine — shared-host load inflates everything):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_block_vs_bare.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.data.batch import batch_from_arrays
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.models.base.step import StepInfo
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

LATENT, BATCH = 512, 256
DIMS = {"m0": (1, 28, 28), "m1": (3, 32, 32)}  # = bench.py DIMS
STEPS_PER_EPOCH, DEPTH = 200, 8


def cost_of(jitted, *args):
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0)), float(c.get("bytes accessed", 0))
    except Exception:
        return None, None


def time_chain(fn, state, rest, sync, n_calls):
    """Wall clock of ``n_calls`` back-to-back dispatches with ONE
    scalar sync at the end (bench.py's protocol): syncing the whole
    out-tree per call costs one tunnel RT PER BUFFER (~30-60 ms for a
    TrainState) and would drown the device rate. The fns donate their
    state carry and return the next state as out[0]; returns
    (seconds_total, final_state)."""
    out = fn(state, *rest)  # warm (compile) outside the window
    sync(out)
    state = out[0]
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = fn(state, *rest)
        state = out[0]
    sync(out)
    return time.perf_counter() - t0, state


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
        output_dir="/tmp/ab_block", num_epochs=DEPTH * 4,
        per_device_train_batch_size=BATCH,
        per_device_eval_batch_size=BATCH, learning_rate=1e-3, seed=0,
        n_devices=1, cache_on_device=True, pipeline_depth=DEPTH,
        steps_per_execution=STEPS_PER_EPOCH,
    )
    trainer = BaseTrainer(model, ds, training_config=cfg)

    # --- bare: bench_jax replica on the trainer's own step body
    step_body = trainer._build_step_body()
    fixed = batch_from_arrays(data={m: v[:BATCH] for m, v in data.items()})
    fixed = jax.tree.map(jnp.asarray, fixed)
    info = StepInfo.create(epoch=1, dataset_size=float(len(ds)))

    def scan_fixed(n):
        def fn(state, batch):
            def body(s, _):
                s, out = step_body(s, batch, info)
                return s, out["loss_sum"]
            return jax.lax.scan(body, state, None, length=n)
        return jax.jit(fn, donate_argnums=(0,))

    sync_loss = lambda out: float(np.asarray(out[1])[-1])  # noqa: E731

    bare = scan_fixed(20)
    f_bare, b_bare = cost_of(bare, trainer.state, fixed)
    t_bare, state = time_chain(bare, trainer.state, (fixed,),
                               sync_loss, n_calls=80)
    t_bare /= 80 * 20

    nog = scan_fixed(STEPS_PER_EPOCH)
    f_nog, b_nog = cost_of(nog, state, fixed)
    t_nog, state = time_chain(nog, state, (fixed,), sync_loss, n_calls=10)
    t_nog /= 10 * STEPS_PER_EPOCH

    # --- chunk: the real cached-gather 200-step program
    trainer.train_loader.set_epoch(1)
    idx = jnp.asarray(trainer._cache_plan_rows(trainer.train_loader))
    chunk = trainer._compiled_cached_train_chunk(STEPS_PER_EPOCH)
    crest = (trainer._train_cache, idx, np.int32(0), np.float32(1.0))
    f_chunk, b_chunk = cost_of(chunk, state, *crest)
    sync_packed = lambda out: float(np.asarray(out[-1]).ravel()[0])  # noqa: E731
    t_chunk, state = time_chain(chunk, state, crest, sync_packed,
                                n_calls=10)
    t_chunk /= 10 * STEPS_PER_EPOCH

    # --- block: the real depth-8 whole-epoch program
    idx_block = jnp.asarray(np.stack([np.asarray(idx)] * DEPTH))
    block = trainer._compiled_cached_train_block(DEPTH)
    brest = (trainer._train_cache, idx_block, np.float32(1.0))
    f_block, b_block = cost_of(block, state, *brest)
    sync_rows = lambda out: float(np.asarray(out[1]).ravel()[0])  # noqa: E731
    t_block, state = time_chain(block, state, brest, sync_rows, n_calls=3)
    t_block /= 3 * DEPTH * STEPS_PER_EPOCH

    # --- block1: same two-level program at depth 1 — isolates the
    # outer-scan nesting cost from the depth
    idx_b1 = idx_block[:1]
    block1 = trainer._compiled_cached_train_block(1)
    b1rest = (trainer._train_cache, idx_b1, np.float32(1.0))
    t_b1, state = time_chain(block1, state, b1rest, sync_rows, n_calls=10)
    t_b1 /= 10 * STEPS_PER_EPOCH

    # --- flat: the SAME window body as one flat scan of depth*200
    # steps (idx_block reshaped) — if this matches chunk, the nested
    # scan itself is the block's 1.4x, and the fix is to flatten it
    window_flat = trainer._train_window_fn(DEPTH * STEPS_PER_EPOCH)
    flat = jax.jit(window_flat, donate_argnums=(0,))
    idx_flat = idx_block.reshape(DEPTH * STEPS_PER_EPOCH, -1)
    frest = (trainer._train_cache, idx_flat, np.int32(0), np.float32(1.0))
    f_flat, b_flat = cost_of(flat, state, *frest)
    t_flat, state = time_chain(flat, state, frest, sync_packed, n_calls=3)
    t_flat /= 3 * DEPTH * STEPS_PER_EPOCH

    print(f"bare 20-step scan : {t_bare * 1e6:8.1f} us/step  "
          f"flops {f_bare and f_bare / 1e9:.2f}G bytes "
          f"{b_bare and b_bare / 1e6:.1f}MB (body-once)")
    print(f"nogather 200-scan : {t_nog * 1e6:8.1f} us/step  "
          f"flops {f_nog and f_nog / 1e9:.2f}G bytes "
          f"{b_nog and b_nog / 1e6:.1f}MB")
    print(f"chunk (cache 200) : {t_chunk * 1e6:8.1f} us/step  "
          f"flops {f_chunk and f_chunk / 1e9:.2f}G bytes "
          f"{b_chunk and b_chunk / 1e6:.1f}MB")
    print(f"block (depth 8)   : {t_block * 1e6:8.1f} us/step  "
          f"flops {f_block and f_block / 1e9:.2f}G bytes "
          f"{b_block and b_block / 1e6:.1f}MB")
    print(f"block (depth 1)   : {t_b1 * 1e6:8.1f} us/step")
    print(f"flat 1600-scan    : {t_flat * 1e6:8.1f} us/step  "
          f"flops {f_flat and f_flat / 1e9:.2f}G bytes "
          f"{b_flat and b_flat / 1e6:.1f}MB")
    print(f"\nchunk/bare: {t_chunk / t_bare:.3f}   "
          f"block/bare: {t_block / t_bare:.3f}   "
          f"nogather/bare: {t_nog / t_bare:.3f}   "
          f"block/chunk: {t_block / t_chunk:.3f}   "
          f"block1/chunk: {t_b1 / t_chunk:.3f}   "
          f"flat/chunk: {t_flat / t_chunk:.3f}")


if __name__ == "__main__":
    main()
