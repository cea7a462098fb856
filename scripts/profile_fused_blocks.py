"""Phase profile of the fused-epoch-block trainer loop on the real chip.

VERDICT r4 weak #1: the published 61.5 ms/epoch doesn't decompose — the
bare device step accounts for ~36 ms/epoch and ~25 ms/epoch is
unattributed (one full host RT), with the depth-8 flush measured at
452.7 ms yet claimed "overlapped". This script times EVERY host-side
call in ``BaseTrainer._train_fused_epoch_blocks`` (reference hot loop:
``/root/reference/src/multivae/trainers/base/base_trainer.py:664-687``)
so the residual has a name:

  plan_build   loader.set_epoch + epoch-plan numpy per block
  plan_put     the (depth, n_batches, B) int32 H2D transfer
  dispatch     the jitted block launch call (returns before completion)
  async_hint   packed_rows.copy_to_host_async()
  callbacks    the per-epoch display-callback replay loop
  flush_wait   np.asarray(packed_rows) until bytes arrive
  finalize     the host finalize python (log lines, bookkeeping)

plus the pure DEVICE time of one block program (timed standalone with
block_until_ready) and the tunnel's bare RT probe. Run on the TPU:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_fused_blocks.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

BATCH, LATENT = 256, 512
DIMS = {"m0": (3, 28, 28), "m1": (3, 28, 28)}
DEPTH = 8
N_EPOCHS = 64 + DEPTH


def build_trainer():
    rng = np.random.default_rng(0)
    data = {m: rng.uniform(size=(BATCH * 200, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    model = MVTCAE(MVTCAEConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
        decoders_dist={m: "bernoulli" for m in DIMS},
    ), seed=0)
    cfg = BaseTrainerConfig(
        output_dir="/tmp/profile_fused", num_epochs=N_EPOCHS,
        per_device_train_batch_size=BATCH,
        per_device_eval_batch_size=BATCH, learning_rate=1e-3, seed=0,
        n_devices=1, cache_on_device=True, pipeline_depth=DEPTH,
        steps_per_execution=200,
    )
    return BaseTrainer(model, ds, training_config=cfg)


def main():
    trainer = build_trainer()
    assert trainer._fused_epoch_blocks_eligible()

    ph = {k: [] for k in ["plan_build", "plan_put", "dispatch",
                          "async_hint", "callbacks", "flush_wait",
                          "finalize", "block_wall"]}

    # --- plan upload: split host plan build vs the H2D put
    orig_put = trainer._cache_put
    orig_plan_block = trainer._upload_epoch_plan_block

    def timed_put(x):
        t0 = time.perf_counter()
        r = orig_put(x)
        ph["plan_put"].append(time.perf_counter() - t0)
        return r

    def timed_plan_block(loader, epochs):
        t0 = time.perf_counter()
        trainer._cache_put = timed_put
        try:
            r = orig_plan_block(loader, epochs)
        finally:
            trainer._cache_put = orig_put
        dt = time.perf_counter() - t0
        ph["plan_build"].append(dt - (ph["plan_put"][-1]
                                      if ph["plan_put"] else 0.0))
        return r

    trainer._upload_epoch_plan_block = timed_plan_block

    # --- the block launch dispatch + the async copy hint
    orig_compiled = trainer._compiled_cached_train_block

    def timed_compiled(n):
        fn = orig_compiled(n)

        def timed_fn(*a, **kw):
            t0 = time.perf_counter()
            r = fn(*a, **kw)
            ph["dispatch"].append(time.perf_counter() - t0)
            return r

        return timed_fn

    trainer._compiled_cached_train_block = timed_compiled

    orig_run_block = trainer._run_cached_train_epoch_block

    def timed_run_block(epochs):
        t0 = time.perf_counter()
        r = orig_run_block(epochs)
        total = time.perf_counter() - t0
        ph["block_wall"].append(total)
        accounted = sum(ph[k][-1] for k in
                        ["plan_build", "plan_put", "dispatch"])
        ph["async_hint"].append(total - accounted)  # hint + glue python
        return r

    trainer._run_cached_train_epoch_block = timed_run_block

    # --- callback replay loop: aggregate wall time via handler wrapping
    cb_time = [0.0]
    handler = trainer.callback_handler
    for name in ["on_epoch_begin", "on_train_step_begin",
                 "on_train_step_end"]:
        orig_cb = getattr(handler, name)

        def wrap(orig_cb):
            def inner(*a, **kw):
                t0 = time.perf_counter()
                r = orig_cb(*a, **kw)
                cb_time[0] += time.perf_counter() - t0
                return r
            return inner

        setattr(handler, name, wrap(orig_cb))

    # --- flush: split the device wait (np.asarray) from host finalize
    orig_fin = trainer._finalize_epoch_block_host

    def timed_fin(epochs, packed_rows, keys, file_logger=None):
        ph["callbacks"].append(cb_time[0])
        cb_time[0] = 0.0
        t0 = time.perf_counter()
        vals = np.asarray(packed_rows)
        t1 = time.perf_counter()
        ph["flush_wait"].append(t1 - t0)
        r = orig_fin(epochs, vals, keys, file_logger=file_logger)
        ph["finalize"].append(time.perf_counter() - t1)
        return r

    trainer._finalize_epoch_block_host = timed_fin

    t0 = time.perf_counter()
    trainer.train()
    wall = time.perf_counter() - t0

    # --- pure device time of one block program
    fn = orig_compiled(DEPTH)
    cache = trainer._train_cache
    plan = trainer._upload_epoch_plan_block.__wrapped__ \
        if hasattr(trainer._upload_epoch_plan_block, "__wrapped__") else None
    trainer.train_loader.set_epoch(1)
    mats = np.stack([trainer._cache_plan_rows(trainer.train_loader)] * DEPTH)
    idx = orig_put(mats)
    state = trainer.state
    dev = []
    for i in range(6):
        t0 = time.perf_counter()
        out = fn(state, cache, idx, np.float32(100 + i * DEPTH))
        state = out[0]
        jax.block_until_ready(out[1])
        dev.append(time.perf_counter() - t0)

    # --- bare RT probe (distinct inputs: the plugin elides repeats)
    add_one = jax.jit(lambda v: v + 1.0)
    float(add_one(jnp.asarray(np.float32(0.0))))
    rts = []
    for i in range(8):
        x = jnp.asarray(np.float32(1.0 + i))
        t0 = time.perf_counter()
        float(add_one(x))
        rts.append(time.perf_counter() - t0)

    def stats(xs, skip=1):
        xs = np.asarray(xs[skip:]) * 1000 if len(xs) > skip else \
            np.asarray(xs) * 1000
        return f"med {np.median(xs):8.1f}  mean {xs.mean():8.1f}  " \
               f"min {xs.min():8.1f}  max {xs.max():8.1f}  n {len(xs)}"

    print(f"total wall: {wall:.2f}s for {N_EPOCHS} epochs "
          f"({wall / N_EPOCHS * 1000:.1f} ms/epoch incl compile)")
    print(f"device block ({DEPTH} epochs, block_until_ready): {stats(dev)}")
    print(f"bare RT probe (ms): {stats(rts, skip=0)}")
    for k in ["plan_build", "plan_put", "dispatch", "async_hint",
              "callbacks", "flush_wait", "finalize", "block_wall"]:
        print(f"{k:>11} (ms/block): {stats(ph[k])}")
    n_blocks = len(ph["block_wall"]) - 1
    if n_blocks > 0:
        tot = {k: float(np.sum(np.asarray(ph[k][1:]) * 1000))
               for k in ph}
        host = sum(tot[k] for k in ["plan_build", "plan_put", "dispatch",
                                    "async_hint", "callbacks",
                                    "flush_wait", "finalize"])
        print(f"\nsteady-state host-side ms/epoch: "
              f"{host / (n_blocks * DEPTH):.2f}")
        for k in ["plan_build", "plan_put", "dispatch", "async_hint",
                  "callbacks", "flush_wait", "finalize"]:
            print(f"  {k:>11}: {tot[k] / (n_blocks * DEPTH):6.2f} ms/epoch")


if __name__ == "__main__":
    main()
