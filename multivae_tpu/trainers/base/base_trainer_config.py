"""Trainer config (reference ``src/multivae/trainers/base/base_trainer_config.py``).

DDP fields (world_size/rank/master addr+port/dist_backend) are replaced by
JAX multi-host fields (coordinator_address/num_processes/process_id), read
from env vars in ``__post_init__`` like the reference reads
LOCAL_RANK/WORLD_SIZE/... (``base_trainer_config.py:74-97``). Optimizer and
scheduler specs are validated eagerly, mirroring ``:99-149``.
"""

from __future__ import annotations

import os
from typing import Optional, Union

import pydantic
from pydantic.dataclasses import dataclass

from ...utils.config import BaseConfig
from .optim import make_optimizer, make_scheduler


@dataclass(config=pydantic.ConfigDict(extra="allow"))
class BaseTrainerConfig(BaseConfig):
    """Main training arguments.

    Args:
        output_dir: where checkpoints, configs and the final model go.
        per_device_train_batch_size / per_device_eval_batch_size: samples
            per batch *per device*; the global batch is this times the
            number of data-parallel devices.
        num_epochs: maximum training epochs.
        optimizer_cls: optax optimizer by torch-style name
            (Adam, AdamW, SGD, RMSprop, Adagrad, Adadelta, Adamax, RAdam).
        optimizer_params: extra optimizer kwargs (torch names accepted,
            e.g. ``betas``).
        scheduler_cls: LR scheduler by torch-style name (StepLR,
            MultiStepLR, ExponentialLR, LinearLR, ConstantLR,
            PolynomialLR, CosineAnnealingLR,
            CosineAnnealingWarmRestarts, ReduceLROnPlateau) or None;
            trajectories match torch's schedulers value-for-value
            (``test_deterministic_scheduler_values_match_torch``).
        scheduler_params: scheduler kwargs.
        learning_rate: base learning rate.
        steps_saving: checkpoint every N epochs (None = never).
        steps_predict: render prediction image grids every N epochs.
        keep_best_on_train: track the best model on train loss instead of
            eval loss.
        seed: global RNG seed.
        drop_last: drop the final partial batch instead of padding it.
        n_devices: number of local devices to use (None = all).
        fsdp: shard parameters and optimizer state over the data mesh
            (ZeRO-style; XLA inserts gathers/reduce-scatters). TPU-native
            extension beyond the reference's DDP.
        n_model_devices: tensor parallelism degree. Devices form a 2-D
            (data, model) mesh; dense kernels/biases (and their optimizer
            moments) shard their output-feature axis over "model"
            (Megatron-style columns), XLA propagates the activation
            collectives. Composes with fsdp. TPU-native extension.
        mixed_precision: run the compiled loss in bfloat16 (fp32 master
            weights and optimizer state; grads are cast back to fp32).
            TPU-native speed/memory option, off by default.
        coordinator_address / num_processes / process_id: jax.distributed
            multi-host setup (replaces DDP env rendezvous).
        checkpoint_backend: "msgpack" (default, host-side, reference-layout
            files) or "orbax" (sharded TrainState checkpointing: each
            host/device writes its own shards — no host gather, works with
            fsdp and multi-host; TPU-native extension).
        microbatch_steps: accumulate each step's gradient over N batch
            chunks in one compiled scan instead of holding the whole
            batch's activations (ops/microbatch). Peak activation
            memory drops ~N-fold with NO rematerialization, so the
            memory-bound K-sample configs (MMVAE / MMVAE+ / CMVAE —
            sum-reduction objectives, for which chunked gradients are
            mathematically exact) can drop ``use_remat`` and its 1.33x
            FLOP overhead: the flagship MMVAE+ resnet protocol runs
            1.77x faster with ``microbatch_steps=2`` +
            ``use_remat=False`` than with remat. Requires the model to
            declare ``loss_is_sum = True``; per-chunk RNG is
            ``fold_in``(step rng, chunk). Default 1 (off).
        async_checkpointing: with the orbax backend, ``save()`` returns
            once the device->host copy completes (safe against the
            donated train step) and the serialization/disk commit runs
            on a background thread, overlapping the next epochs'
            compute; barriers run before the next save, any restore,
            and the end of ``train()``. Default True; set False to
            force every save to block until durable.
        cache_on_device: upload the dataset to HBM once and gather each
            batch ON DEVICE inside the jitted step — epochs run with no
            per-step host->device data transfers, with batches
            bit-identical to the host loader's (the per-epoch shuffle
            stays the same seeded host permutation). Falls back to the
            host loader automatically (with a logged reason) when the
            dataset exceeds ``device_cache_budget_gb`` or doesn't
            support bulk indexing. Works under multi-host training too:
            each process materializes and uploads only its LOCAL shard
            of the global array (sharded layout), or the full dataset
            (replicated).
            TPU-native extension, off by default.
        device_cache_budget_gb: per-device HBM budget for the dataset
            cache (train + eval combined must fit).
        device_cache_layout: device layout of the cache on multi-device
            meshes. "replicated" (every device holds the full dataset;
            per-step gathers are collective-free), "sharded" (rows
            sharded over the mesh's "data" axis — per-device HBM drops
            by the data-axis size; XLA lowers the in-step gather to a
            tiny index all-gather + one batch-sized ICI all-reduce;
            batches stay bit-identical), or "auto" (default): replicated
            when it fits the per-device budget, sharded otherwise — so a
            dataset N x larger than one chip's budget still trains with
            zero per-step host transfers on an N-device mesh. Ignored on
            single-device meshes.
        steps_per_execution: fuse this many train/eval steps into one
            compiled ``lax.scan`` dispatch (requires cache_on_device).
            Removes per-step host dispatch latency; per-step callbacks
            still advance once per step, after each chunk. 1 = one
            dispatch per step (default).
        pipeline_epochs: defer each epoch's host-side finalization (the
            blocking device->host metric fetch, NaN guard, best-model
            tracking, logging) by up to ``pipeline_depth`` epochs so the
            per-epoch transfers amortize: the accumulated epochs'
            scalars come back in ONE device round trip, and shuffled
            index plans upload ``pipeline_depth`` epochs per transfer.
            Logged values are bit-identical to the synchronous loop,
            but arrive deferred (in order, in bursts at flush time),
            and a NaN loss surfaces up to ``pipeline_depth`` epochs of
            device work late. Checkpoint/prediction epochs and the
            last epoch always flush synchronously. LR schedulers stay
            eligible: deterministic schedules set each epoch's LR at
            dispatch time, and ReduceLROnPlateau rides the fused epoch
            blocks with its state carried in-graph (it cannot pipeline
            per-epoch dispatch, so it falls back to the synchronous
            loop when blocks are ineligible). Automatically disabled
            when a subclass overrides the step hooks or
            ``prepare_train_step`` without declaring its boundary
            epochs (the MultistageTrainer declares them and stays
            eligible), or when any non-display callback
            overrides ``on_epoch_end`` (a deferred hook would observe
            a later epoch's trainer state). TPU-native extension, on
            by default.
        pipeline_depth: max epochs finalization may lag behind the
            device (and the epoch-plan upload block size). Each
            deferred epoch retains its post-epoch parameter snapshot on
            device until its flush, so HBM cost grows by
            ``pipeline_depth x |params|``; lower it for very large
            models. Ignored when ``pipeline_epochs=False`` (plan
            uploads still batch by this size — semantics-free).
    """

    output_dir: Optional[str] = None
    per_device_train_batch_size: int = 64
    per_device_eval_batch_size: int = 64
    num_epochs: int = 100
    optimizer_cls: str = "Adam"
    optimizer_params: Union[dict, None] = None
    scheduler_cls: Union[str, None] = None
    scheduler_params: Union[dict, None] = None
    learning_rate: float = 1e-4
    steps_saving: Union[int, None] = None
    steps_predict: Union[int, None] = None
    keep_best_on_train: bool = False
    seed: int = 8
    drop_last: bool = False
    n_devices: Union[int, None] = None
    mixed_precision: bool = False
    fsdp: bool = False
    n_model_devices: int = 1
    coordinator_address: Union[str, None] = None
    num_processes: Union[int, None] = None
    process_id: Union[int, None] = None
    checkpoint_backend: str = "msgpack"
    async_checkpointing: bool = True
    microbatch_steps: int = 1
    cache_on_device: bool = False
    device_cache_budget_gb: float = 8.0
    device_cache_layout: str = "auto"
    steps_per_execution: int = 1
    pipeline_epochs: bool = True
    pipeline_depth: int = 8

    def __post_init__(self):
        if hasattr(super(), "__post_init__"):
            super().__post_init__()

        if self.checkpoint_backend not in ("msgpack", "orbax"):
            raise AttributeError(
                "checkpoint_backend must be 'msgpack' or 'orbax', got "
                f"{self.checkpoint_backend!r}."
            )

        if self.n_model_devices < 1:
            raise AttributeError(
                "n_model_devices must be a positive integer, got "
                f"{self.n_model_devices}."
            )

        if self.steps_per_execution < 1:
            raise AttributeError(
                "steps_per_execution must be a positive integer, got "
                f"{self.steps_per_execution}."
            )
        if self.microbatch_steps < 1:
            raise AttributeError(
                "microbatch_steps must be a positive integer, got "
                f"{self.microbatch_steps}."
            )
        if self.pipeline_depth < 1:
            raise AttributeError(
                "pipeline_depth must be a positive integer, got "
                f"{self.pipeline_depth}."
            )
        if self.device_cache_layout not in ("auto", "replicated",
                                            "sharded"):
            raise AttributeError(
                "device_cache_layout must be 'auto', 'replicated' or "
                f"'sharded', got {self.device_cache_layout!r}."
            )
        if self.steps_per_execution > 1 and not self.cache_on_device:
            raise AttributeError(
                "steps_per_execution > 1 requires cache_on_device=True "
                "(fused multi-step dispatch gathers batches on device)."
            )

        # Multi-host settings from the environment (reference reads
        # LOCAL_RANK/WORLD_SIZE/RANK/MASTER_ADDR/MASTER_PORT).
        env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if self.coordinator_address is None and env_coord:
            self.coordinator_address = env_coord
        env_nproc = os.environ.get("JAX_NUM_PROCESSES")
        if self.num_processes is None and env_nproc:
            self.num_processes = int(env_nproc)
        env_pid = os.environ.get("JAX_PROCESS_ID")
        if self.process_id is None and env_pid:
            self.process_id = int(env_pid)

        # Eager validation of the optimizer / scheduler specs.
        make_optimizer(self.optimizer_cls, self.learning_rate,
                       self.optimizer_params)
        make_scheduler(self.scheduler_cls, self.learning_rate,
                       self.scheduler_params)
