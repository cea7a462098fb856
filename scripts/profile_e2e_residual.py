"""Decompose the fused-block e2e trainer residual (VERDICT r4 task #1).

Replicates bench.py's bench_trainer_e2e config (MVTCAE MLP-512, B=256,
200-step epochs, depth-8 fused blocks, cache_on_device) and times every
host-side phase of each block on the REAL device:

  plan    : 8x epoch_plan() + np.stack + upload of the (8,200,B) index block
  launch  : the block fn() call (async dispatch; host serialization time)
  hint    : copy_to_host_async on the packed scalar rows
  cbs     : the 8x200 display-callback cycle
  flush   : np.asarray(prev packed_rows) wait + host finalize loop
  other   : block wall minus the named phases

Run on the tunneled TPU:  python scripts/profile_e2e_residual.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

BATCH, LATENT = 256, 512
DIMS = {"m0": (784,), "m1": (1568,)}
N_EPOCHS = 40
DEPTH = 8


def main():
    rng = np.random.default_rng(0)
    n_samples = BATCH * 200
    data = {m: rng.uniform(size=(n_samples, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    ds = MultimodalBaseDataset(data)
    model = MVTCAE(MVTCAEConfig(
        n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
        decoders_dist={m: "bernoulli" for m in DIMS},
    ), seed=0)
    cfg = BaseTrainerConfig(
        output_dir="/tmp/profile_e2e", num_epochs=N_EPOCHS,
        per_device_train_batch_size=BATCH,
        per_device_eval_batch_size=BATCH, learning_rate=1e-3, seed=0,
        n_devices=1, cache_on_device=True, pipeline_depth=DEPTH,
        steps_per_execution=200,
    )
    trainer = BaseTrainer(model, ds, training_config=cfg)
    assert trainer._fused_epoch_blocks_eligible()

    phases = {k: [] for k in ("plan", "launch", "hint", "cbs", "flush",
                              "wall")}

    # --- instrument the internals --------------------------------------
    orig_upload = trainer._upload_epoch_plan_block

    def upload(loader, epochs):
        t0 = time.perf_counter()
        r = orig_upload(loader, epochs)
        try:  # force the upload to complete so 'plan' isn't hidden async
            r.block_until_ready()
        except Exception:
            pass
        phases["plan"].append(time.perf_counter() - t0)
        return r

    trainer._upload_epoch_plan_block = upload

    orig_run = trainer._run_cached_train_epoch_block

    def run_block(epochs):
        t0 = time.perf_counter()
        out = orig_run(epochs)
        t1 = time.perf_counter()
        # upload already timed inside; launch = rest of run_block
        phases["launch"].append(t1 - t0 - phases["plan"][-1])
        return out

    trainer._run_cached_train_epoch_block = run_block

    orig_fin = trainer._finalize_epoch_block_host

    def fin(*a, **kw):
        t0 = time.perf_counter()
        r = orig_fin(*a, **kw)
        phases["flush"].append(time.perf_counter() - t0)
        return r

    trainer._finalize_epoch_block_host = fin

    orig_cb = trainer.callback_handler.on_train_step_end

    class _CbTimer:
        cur = 0.0

        def __call__(self, *a, **kw):
            t0 = time.perf_counter()
            orig_cb(*a, **kw)
            _CbTimer.cur += time.perf_counter() - t0

    trainer.callback_handler.on_train_step_end = _CbTimer()

    walls = []
    orig_loop = trainer._train_fused_epoch_blocks

    # time whole-block walls by hooking prepare_train_step (runs once per
    # epoch at the top of each block iteration)
    block_starts = []
    orig_prep = trainer.prepare_train_step

    def prep(epoch, bt, be):
        if (epoch - 1) % DEPTH == 0:
            phases["cbs"].append(_CbTimer.cur)
            _CbTimer.cur = 0.0
            block_starts.append(time.perf_counter())
        return orig_prep(epoch, bt, be)

    trainer.prepare_train_step = prep

    t_train0 = time.perf_counter()
    trainer.train()
    t_train1 = time.perf_counter()
    phases["cbs"].append(_CbTimer.cur)

    walls = list(np.diff(np.asarray(block_starts)))
    print(f"\ntotal train(): {t_train1 - t_train0:.2f}s  "
          f"({N_EPOCHS} epochs x 200 steps)")
    nb = len(block_starts)
    print(f"blocks: {nb}; steady-state walls (skip first=compile):")

    def stats(xs, skip=1):
        xs = np.asarray(xs[skip:]) * 1000
        return (f"n={len(xs)} median={np.median(xs):7.1f}ms "
                f"min={xs.min():7.1f} max={xs.max():7.1f}") if len(xs) \
            else "n=0"

    print(f"  wall   : {stats(walls)}")
    for k in ("plan", "launch", "hint", "cbs", "flush"):
        print(f"  {k:7s}: {stats(phases[k])}")
    med = {k: float(np.median(np.asarray(v[1:]) * 1000)) if len(v) > 1
           else 0.0 for k, v in phases.items()}
    wall_med = float(np.median(np.asarray(walls[1:]) * 1000))
    named = med["plan"] + med["launch"] + med["cbs"] + med["flush"]
    print(f"\nmedian wall {wall_med:.1f}ms = plan {med['plan']:.1f} + "
          f"launch {med['launch']:.1f} + cbs {med['cbs']:.1f} + "
          f"flush {med['flush']:.1f} + other {wall_med - named:.1f}")
    dev_ms = DEPTH * 200 / 5500 * 1000
    print(f"device compute (at 5500 steps/s): {dev_ms:.0f}ms/block; "
          f"residual vs device: {wall_med - dev_ms:.1f}ms/block "
          f"= {(wall_med - dev_ms) / DEPTH:.1f}ms/epoch")


if __name__ == "__main__":
    main()
