"""TPU performance tuning (no reference counterpart — this tutorial
covers the TPU-native performance features this framework adds beyond
the reference MultiVae API; see ``docs/SCALING.md`` for the full
one-chip-to-pod recipe and ``docs/PERFORMANCE.md`` for measured
numbers).

Everything below runs on CPU in about a minute — the knobs are
backend-agnostic and simply matter more on a real TPU::

    python examples/tutorials/tpu_performance_tuning.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

# %% 1. A tiny synthetic bimodal dataset and a model.
# The knobs below are orthogonal to the model choice — any of the 14
# families works the same way.
import jax

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

rng = np.random.default_rng(0)
N = 512
data = {
    "m0": rng.normal(size=(N, 16)).astype(np.float32),
    "m1": rng.normal(size=(N, 8)).astype(np.float32),
}
dataset = MultimodalBaseDataset(data)

model_cfg = MVTCAEConfig(n_modalities=2, latent_dim=8,
                         input_dims={"m0": (16,), "m1": (8,)})

# %% 2. bf16 mixed precision.
# ``mixed_precision=True`` runs compute in bfloat16 with float32 master
# weights — every loss-path reduction accumulates in f32, so training
# stays stable. It pays off on MXU-bound (conv / K-sample) workloads;
# tiny MLPs like this one won't speed up, but the API is the same.
trainer = BaseTrainer(
    MVTCAE(model_cfg, seed=0), dataset,
    training_config=BaseTrainerConfig(
        output_dir=None, num_epochs=2, per_device_train_batch_size=64,
        learning_rate=1e-3, mixed_precision=True,
        keep_best_on_train=True,
    ))
trainer.train()
print("bf16 run best train loss:", trainer.best_train_loss)

# %% 3. The device-resident data pipeline.
# ``cache_on_device=True`` uploads the dataset to HBM once; every batch
# is then gathered INSIDE the jitted step from a tiny per-epoch index
# plan — zero per-step host->device transfers, with batches
# bit-identical to the host loader (same seeded shuffle + padding).
# ``steps_per_execution=N`` fuses N steps into one compiled scan
# dispatch. Falls back automatically (with a logged reason) when the
# dataset exceeds ``device_cache_budget_gb``.
trainer = BaseTrainer(
    MVTCAE(model_cfg, seed=0), dataset,
    training_config=BaseTrainerConfig(
        output_dir=None, num_epochs=4, per_device_train_batch_size=64,
        learning_rate=1e-3,
        keep_best_on_train=True,
        cache_on_device=True, steps_per_execution=8,
    ))
assert trainer._train_cache is not None
trainer.train()
print("device-cached run best train loss:", trainer.best_train_loss)

# %% 4. Pipelined epochs and fused epoch blocks.
# ``pipeline_epochs=True`` (the default) defers each epoch's host-side
# finalization so host round trips amortize across ``pipeline_depth``
# epochs — logged values are bit-identical, only their timing shifts.
# When ``steps_per_execution`` covers the epoch, whole depth-sized
# epoch BLOCKS additionally fuse into a single XLA launch — including
# the eval pass, best-model tracking, deterministic LR schedules
# (per-epoch LR vector shipped per block) and ReduceLROnPlateau (state
# carried in-graph), so the full benchmark-protocol configuration
# keeps one launch per ``pipeline_depth`` epochs. Only genuine host
# decisions (model ``update`` hooks, custom epoch-end callbacks,
# overridden step hooks) fall back to per-epoch dispatch.
trainer = BaseTrainer(
    MVTCAE(model_cfg, seed=0), dataset,
    training_config=BaseTrainerConfig(
        output_dir=None, num_epochs=8, per_device_train_batch_size=64,
        learning_rate=1e-3, pipeline_depth=4,
        cache_on_device=True, steps_per_execution=64,
    ))
assert trainer._pipeline_epochs_eligible()
assert trainer._fused_epoch_blocks_eligible()
trainer.train()
print("fused-block run finished;",
      "one launch per 4 epochs" if ("block", 4) in trainer._cached_train_fns
      else "per-epoch path")

# %% 5. Microbatched gradient accumulation (memory lever).
# ``microbatch_steps=N`` scans N batch chunks and sums their gradients
# in one compiled program — mathematically EXACT for the batch-sum
# K-sample objectives (MMVAE / MMVAE+ / CMVAE), and cheaper than
# rematerialization: peak activation memory halves per doubling with no
# recomputed FLOPs. Prefer it over ``use_remat=True`` when the batch,
# not a single sample, is what doesn't fit.
from multivae_tpu.models import MMVAE, MMVAEConfig

mmvae = MMVAE(MMVAEConfig(n_modalities=2, latent_dim=8, K=2,
                          input_dims={"m0": (16,), "m1": (8,)}), seed=0)
trainer = BaseTrainer(
    mmvae, dataset,
    training_config=BaseTrainerConfig(
        output_dir=None, num_epochs=1, per_device_train_batch_size=64,
        learning_rate=1e-3, microbatch_steps=2,
    ))
loss, _ = trainer.train_step(1)
print("microbatched MMVAE step loss:", loss)

# %% 6. Multi-device meshes (data / FSDP / tensor parallelism).
# All parallelism is declarative: ``n_devices`` shards batches over a
# "data" mesh axis (XLA inserts the gradient all-reduce), ``fsdp=True``
# ZeRO-shards params/optimizer over the same axis, ``n_model_devices``
# adds a Megatron-style "model" axis — no model-code changes for any of
# them. The dataset cache can live row-SHARDED over the data axis
# (``device_cache_layout="sharded"``: 1/N of the dataset per device) so
# datasets N x larger than one chip's HBM budget still train with zero
# per-step host transfers. Run this section with 8 virtual devices:
#
#   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
#       python examples/tutorials/tpu_performance_tuning.py
n_dev = len(jax.devices())
if n_dev >= 2:
    trainer = BaseTrainer(
        MVTCAE(model_cfg, seed=0), dataset,
        training_config=BaseTrainerConfig(
            output_dir=None, num_epochs=1,
            per_device_train_batch_size=64 // n_dev, learning_rate=1e-3,
            n_devices=n_dev, fsdp=True,
            cache_on_device=True, device_cache_layout="sharded",
        ))
    loss, _ = trainer.train_step(1)
    print(f"{n_dev}-device fsdp + sharded-cache step loss:", loss)
else:
    print("single device visible — skipping the mesh section "
          "(see the command above to run it on a virtual mesh)")

# %% 7. Where to go next.
# - docs/SCALING.md  — the full one-chip-to-pod recipe (memory levers,
#   checkpoint topologies, serving export).
# - docs/PERFORMANCE.md — measured throughput/MFU numbers and the
#   negative results (what we tried that DIDN'T help, and why).
# - examples/distributed_training.py — the multi-host launch recipe.
print("done")
