"""BaseTrainer: jitted, mesh-sharded epoch training loop.

TPU-native counterpart of reference
``src/multivae/trainers/base/base_trainer.py`` (885 LoC torch/DDP trainer).
Same public surface — ``BaseTrainer(model, train_dataset, eval_dataset,
training_config, callbacks, checkpoint).train()`` — with the hot path
redesigned for XLA:

- one compiled ``train_step(state, batch, info) -> (state, outputs)`` with
  the TrainState donated (params update in place in HBM);
- data parallelism over a 1-D device mesh via NamedSharding (gradient
  all-reduce inserted by XLA), replacing DDP/NCCL (SURVEY §2.3);
- static batch shapes (loader pads + zero-weights) so nothing retraces;
- per-epoch host work limited to scalar fetches: metric sums stay on
  device during the epoch.

Semantics parity: best-model tracking gated by ``start_keep_best_epoch``
(``base_trainer.py:501-523``), NaN -> ArithmeticError (``:629-630,684-685``),
checkpoints save the *best* model (``:550-553``), loss_sum/len(dataset)
epoch-loss reduction (``:621-626,697-700``), multistage-model refusal
(``:156-163``).
"""

from __future__ import annotations

import datetime
import json
import logging
import os
from typing import Any, List, Optional

import numpy as np

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax import serialization

from ...data.batch import MultimodalBatch
from ...data.loader import DataLoader
from ...data.utils import adapt_shape, grid_to_pil, make_grid
from ...models.base.base_ae_model import BaseMultiVAE
from ...models.base.base_model import BaseModel
from ...models.base.step import StepInfo
from ...parallel.mesh import (
    batch_sharding,
    get_data_mesh,
    maybe_init_distributed,
    replicated_sharding,
    shard_batch,
)
from .base_trainer_config import BaseTrainerConfig
from .callbacks import (
    CallbackHandler,
    MetricConsolePrinterCallback,
    ProgressBarCallback,
    TrainingCallback,
)
from .optim import get_learning_rate, make_optimizer, make_scheduler, set_learning_rate
from .utils import set_seed, update_dict

logger = logging.getLogger(__name__)
logger.setLevel(logging.INFO)


def _to_bf16(tree):
    """Cast float32 leaves to bfloat16 (mixed-precision compute)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        tree,
    )


def _packed_scalars_in_graph(sums):
    """In-graph counterpart of ``BaseTrainer._pack_epoch_scalars``: fuse
    a chunk's ``{"loss_sum", "metrics"}`` sums into one f32 vector
    INSIDE the chunk program (key order = sorted, matching the pytree
    order jit returns dicts in), so single-chunk epochs need no separate
    pack dispatch."""
    metrics = sums["metrics"]
    return jnp.stack(
        [jnp.asarray(sums["loss_sum"], jnp.float32)]
        + [jnp.asarray(metrics[k], jnp.float32) for k in sorted(metrics)])


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    rng: jax.Array
    step: jnp.ndarray


def _state_with_lr(state: TrainState, lr) -> TrainState:
    """Functional in-graph counterpart of ``optim.set_learning_rate``:
    rewire the ``inject_hyperparams`` learning-rate leaf (a () f32
    array) to ``lr``. Used by the fused epoch-block programs to apply a
    deterministic LR schedule per epoch ON DEVICE — free in the compiled
    program (a scalar rewiring, no params copy)."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hp))


class BaseTrainer:
    """Single- or multi-device (data-parallel) epoch trainer.

    Args:
        model: a BaseMultiVAE (or BaseModel) instance.
        train_dataset / eval_dataset: MultimodalBaseDataset instances.
        training_config: BaseTrainerConfig.
        callbacks: list of TrainingCallback.
        checkpoint: path to a ``checkpoint_epoch_N`` folder to resume from.
    """

    def __init__(self, model: BaseModel, train_dataset, eval_dataset=None,
                 training_config: Optional[BaseTrainerConfig] = None,
                 callbacks: Optional[List[TrainingCallback]] = None,
                 checkpoint: Optional[str] = None):
        if training_config is None:
            training_config = BaseTrainerConfig()
        if training_config.output_dir is None:
            training_config.output_dir = "dummy_output_dir"

        self.checktrainer(model)

        self.model = model
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.training_config = training_config
        self.model_config = getattr(model, "model_config", None)

        maybe_init_distributed(
            training_config.coordinator_address,
            training_config.num_processes,
            training_config.process_id,
        )
        self.mesh = get_data_mesh(
            training_config.n_devices,
            n_model_devices=training_config.n_model_devices,
        )
        self.n_data_devices = self.mesh.shape["data"]
        self.is_main_process = jax.process_index() == 0

        set_seed(training_config.seed)

        global_train_batch = (
            training_config.per_device_train_batch_size * self.n_data_devices
        )
        global_eval_batch = (
            training_config.per_device_eval_batch_size * self.n_data_devices
        )
        self.train_loader = DataLoader(
            train_dataset, global_train_batch, shuffle=True,
            seed=training_config.seed, drop_last=training_config.drop_last,
            num_processes=jax.process_count(), process_index=jax.process_index(),
        )
        self.eval_loader = (
            DataLoader(
                eval_dataset, global_eval_batch, shuffle=False,
                seed=training_config.seed, drop_last=training_config.drop_last,
                num_processes=jax.process_count(),
                process_index=jax.process_index(),
            )
            if eval_dataset is not None else None
        )

        if training_config.microbatch_steps > 1:
            if not getattr(model, "loss_is_sum", False):
                raise AttributeError(
                    "microbatch_steps > 1 requires a SUM-reduction "
                    "objective (chunked gradient accumulation is only "
                    f"exact for batch-sum losses); {type(model).__name__} "
                    "does not declare loss_is_sum = True."
                )
            if global_train_batch % training_config.microbatch_steps:
                raise AttributeError(
                    f"global train batch size {global_train_batch} is not "
                    "divisible by microbatch_steps="
                    f"{training_config.microbatch_steps}."
                )

        self.optimizer = make_optimizer(
            training_config.optimizer_cls, training_config.learning_rate,
            training_config.optimizer_params,
        )
        self.scheduler = make_scheduler(
            training_config.scheduler_cls, training_config.learning_rate,
            training_config.scheduler_params,
        )

        # lazily-initialized models (MHVAE) get their params built from a
        # real batch here, so users never need a warmup forward call
        if (getattr(model, "params", None) is None
                and hasattr(model, "init_params_with_batch")):
            from ...data.batch import as_batch

            model.init_params_with_batch(as_batch(train_dataset[:2]))

        params = model._ensure_params()
        self.state = TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            rng=jax.random.key(training_config.seed),
            step=jnp.asarray(0, jnp.int32),
        )

        self.trained_epochs = 0
        self.best_train_loss = float("inf")
        self.best_eval_loss = float("inf")
        # None means "no best snapshot yet": fall back to the live model
        # params (reference initializes _best_model = the live model).
        self._best_params = None
        self._block_best = None  # fused-block in-graph (loss, params) carry
        self._sched_carry = None  # fused-block in-graph plateau LR state
        self._sched_in_graph = False
        # Epoch at which the CURRENT scheduler instance started (0 for a
        # fresh run; a MultistageTrainer optimizer reset re-seats it):
        # deterministic dispatch-time LRs are lr_at(epoch-1-base).
        self._sched_epoch_base = 0
        self.start_keep_best_epoch = getattr(model, "start_keep_best_epoch", 0)

        self._train_step_fn = None
        self._eval_step_fn = None
        self._cached_train_fns = {}
        self._cached_eval_fns = {}
        self._plan_cache = {}

        # Device-resident dataset caches (TPU-native: see data/device_cache)
        self._train_cache = None
        self._eval_cache = None
        if training_config.cache_on_device:
            from ...data.device_cache import (
                build_device_cache,
                cache_per_device_nbytes,
            )

            budget = int(training_config.device_cache_budget_gb * 1e9)
            layout = training_config.device_cache_layout
            self._train_cache = build_device_cache(
                train_dataset, self.mesh, budget, layout=layout)
            if self._train_cache is not None and self.mesh.size == 1:
                # Share with the sampler fit path: a post-training
                # MAF/IAF/GMM fit on the same dataset reuses this cache
                # instead of uploading a SECOND full HBM copy (the
                # sampler memoizes under the same attribute; only
                # single-device caches qualify — a multi-device cache's
                # committed NamedShardings don't fit the sampler's
                # single-device collect program).
                try:
                    train_dataset._sampler_device_cache = self._train_cache
                except Exception:  # pragma: no cover - exotic datasets
                    pass
            if eval_dataset is not None:
                # Budget the eval cache independently: a train set that
                # fell back (over budget / unindexable) must not also
                # cost the eval set its HBM residency. ``used`` is the
                # train cache's ACTUAL per-device footprint (layout-aware:
                # a sharded cache costs 1/n_data per device).
                used = 0
                if self._train_cache is not None:
                    used = cache_per_device_nbytes(self._train_cache)
                self._eval_cache = build_device_cache(
                    eval_dataset, self.mesh, max(budget - used, 0),
                    layout=layout)

        self._run_model_sanity_check()

        if checkpoint is not None:
            self._resume_from_checkpoint(checkpoint)

        # Output dir with training signature (reference ``:265-289``)
        signature = str(datetime.datetime.now())[:19].replace(" ", "_").replace(
            ":", "-"
        )
        self.training_dir = os.path.join(
            training_config.output_dir,
            f"{getattr(model, 'model_name', type(model).__name__)}"
            f"_training_{signature}",
        )
        if self.is_main_process:
            os.makedirs(self.training_dir, exist_ok=True)

        callbacks = list(callbacks) if callbacks is not None else []
        callbacks.append(ProgressBarCallback())
        callbacks.append(MetricConsolePrinterCallback())
        self.callback_handler = CallbackHandler(callbacks, model)
        self.callback_handler.on_init_end(training_config)

    # -------------------------------------------------------------- checks
    def checktrainer(self, model):
        """Refuse models that require multistage training
        (reference ``base_trainer.py:156-163``)."""
        if getattr(model, "reset_optimizer_epochs", None):
            raise AttributeError(
                f"The model {type(model).__name__} requires the "
                "MultistageTrainer for training (it defines "
                "reset_optimizer_epochs). Please use "
                "multivae_tpu.trainers.MultistageTrainer instead of BaseTrainer."
            )

    def _run_model_sanity_check(self):
        """One shape-level forward on a real batch before training starts.

        Reference ``base_trainer.py:328-347`` runs a full forward; here
        ``jax.eval_shape`` catches wiring errors without burning a compile.
        """
        try:
            batch = next(iter(self.train_loader))
            jax.eval_shape(
                self.model.loss_function, self.state.params, batch,
                jax.random.key(0), StepInfo.create(),
            )
        except Exception as e:
            raise ValueError(
                "Error when calling forward on a batch of the training "
                "dataset. Possible reasons: the data input doesn't match "
                "your model's architecture or the model config. Original "
                f"exception: {e}"
            ) from e

    # ------------------------------------------------------------- stepping
    def _build_step_body(self):
        """The pure per-step update ``(state, batch, info) -> (state, out)``
        shared by the per-batch jit and the device-cached scan paths.

        With ``microbatch_steps=N > 1`` the gradient is accumulated over
        N batch chunks in one ``lax.scan`` (``ops/microbatch``): peak
        activation memory drops by N with NO rematerialization — for
        sum-reduction objectives (the K-sample models, exactly the
        memory-hungry ones) the gradients are mathematically identical
        to the full-batch step, and the step pays the ideal 3
        forward-equivalents of FLOPs instead of remat's 4 (measured
        1.77x on the flagship MMVAE+ resnet protocol together with the
        broadcast upsample)."""
        model = self.model
        optimizer = self.optimizer
        mixed = self.training_config.mixed_precision
        n_micro = getattr(self.training_config, "microbatch_steps", 1)

        def loss_fn(params, batch, rng, info):
            if mixed:
                params = _to_bf16(params)
                batch = _to_bf16(batch)
            out = model.loss_function(params, batch, rng, info)
            return out["loss"].astype(jnp.float32), out

        def grads_and_out(params, batch, rng, info):
            if n_micro == 1:
                (_, out), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch, rng, info)
                return grads, {"loss_sum": out["loss_sum"],
                               "metrics": out.get("metrics", {})}

            from ...ops.microbatch import microbatched_value_and_grad

            # loss_sum rides in the aux tree and is chunk-MEANED by the
            # helper; multiplying back by n_micro recovers the sum.
            def chunk_loss(p, b, r):
                loss, out = loss_fn(p, b, r, info)
                return loss, {"loss_sum": out["loss_sum"],
                              "metrics": out.get("metrics", {})}

            mvg = microbatched_value_and_grad(chunk_loss, n_micro,
                                              has_aux=True)
            (_, aux), grads = mvg(params, batch, rng)
            return grads, {"loss_sum": aux["loss_sum"] * n_micro,
                           "metrics": aux["metrics"]}

        def step_fn(state: TrainState, batch: MultimodalBatch, info: StepInfo):
            rng = jax.random.fold_in(state.rng, state.step)
            grads, out = grads_and_out(state.params, batch, rng, info)
            if mixed:
                grads = jax.tree.map(
                    lambda g: g.astype(jnp.float32), grads
                )
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state, step=state.step + 1
            )
            return new_state, out

        return step_fn

    def _compiled_train_step(self):
        if self._train_step_fn is not None:
            return self._train_step_fn
        rep = replicated_sharding(self.mesh)
        bsh = batch_sharding(self.mesh)
        step_fn = self._build_step_body()

        if self.mesh.size == 1:
            # single-device: explicit shardings are semantic no-ops but
            # their COMMITTED outputs fall off the axon plugin's fast
            # execution path (measured 80x; see utils/host_init.py) —
            # plain jit keeps placement uncommitted
            self._train_step_fn = jax.jit(step_fn, donate_argnums=(0,))
            return self._train_step_fn
        state_sh = self._state_sharding(rep)
        self._train_step_fn = jax.jit(
            step_fn, donate_argnums=(0,),
            in_shardings=(state_sh, bsh, rep),
            out_shardings=(state_sh, rep),
        )
        return self._train_step_fn

    def _state_sharding(self, rep):
        """TrainState sharding: replicated, ZeRO-style when fsdp, and/or
        tensor-parallel over the model axis when n_model_devices > 1."""
        cfg = self.training_config
        if not cfg.fsdp and cfg.n_model_devices <= 1:
            return rep
        from ...parallel.mesh import combined_state_sharding

        return combined_state_sharding(self.state, self.mesh, fsdp=cfg.fsdp)

    def _params_sharding(self, rep):
        cfg = self.training_config
        if not cfg.fsdp and cfg.n_model_devices <= 1:
            return rep
        from ...parallel.mesh import combined_state_sharding

        return combined_state_sharding(self.state.params, self.mesh,
                                       fsdp=cfg.fsdp)

    def _build_eval_body(self):
        model = self.model
        loss_function = getattr(model, "eval_loss_function",
                                model.loss_function)

        def eval_fn(params, batch, rng, info):
            out = loss_function(params, batch, rng, info)
            return {"loss_sum": out["loss_sum"],
                    "metrics": out.get("metrics", {})}

        return eval_fn

    def _compiled_eval_step(self):
        if self._eval_step_fn is not None:
            return self._eval_step_fn
        rep = replicated_sharding(self.mesh)
        bsh = batch_sharding(self.mesh)
        eval_fn = self._build_eval_body()

        if self.mesh.size == 1:
            self._eval_step_fn = jax.jit(eval_fn)
            return self._eval_step_fn
        self._eval_step_fn = jax.jit(
            eval_fn,
            in_shardings=(self._params_sharding(rep), bsh, rep, rep),
            out_shardings=rep,
        )
        return self._eval_step_fn

    def prepare_train_step(self, epoch, best_train_loss, best_eval_loss):
        """Hook for inter-epoch changes (optimizer resets in the
        MultistageTrainer)."""
        return best_train_loss, best_eval_loss

    _pack_scalars_fn = None

    def _pack_epoch_scalars(self, loss_sum_total, metric_sums):
        """Fuse an epoch's device scalars (loss sum + metric sums) into
        ONE device ``(1+n_metrics,)`` f32 vector at dispatch time,
        returning ``(vec, keys)``. The flush-side fetch then touches a
        single buffer per epoch: the tunnel's fetch cost scales with
        the NUMBER of argument buffers, not bytes — a depth-8 flush
        stacking 72 loose scalar buffers in one program measured
        ~620 ms idle and multi-second under host load (a handle
        round trip per buffer), vs one ~44 ms round trip for packed
        vectors. The pack itself is one tiny async dispatch riding
        behind the epoch's compute."""
        keys = list(metric_sums)
        if BaseTrainer._pack_scalars_fn is None:
            BaseTrainer._pack_scalars_fn = jax.jit(
                lambda loss, vals: jnp.stack(
                    [jnp.asarray(loss, jnp.float32)]
                    + [jnp.asarray(v, jnp.float32) for v in vals]))
        vec = BaseTrainer._pack_scalars_fn(
            loss_sum_total, [metric_sums[k] for k in keys])
        return vec, keys

    _concat_scalars_fn = None

    def _fetch_scalar_groups(self, groups, staged: bool = False):
        """Materialize several packed ``(vec, keys)`` epoch-scalar
        groups (see ``_pack_epoch_scalars``) in ONE device->host
        transfer (each individual ``float(x)`` costs a full round trip
        — measured 44 ms apiece through the TPU tunnel). Returns one
        ``(loss, {k: v})`` tuple per group.

        ``staged=True`` (pipelined flushes whose vectors already ran
        ``copy_to_host_async`` at deferral time) reads each vector's
        host-staged value directly instead of launching the concat
        program — a flush-time dispatch would queue behind whatever
        epochs are in flight on a serialized transport."""
        vecs = [vec for vec, _ in groups]
        if len(vecs) == 1:
            vals = np.asarray(vecs[0])
        elif staged:
            vals = np.concatenate([np.asarray(v) for v in vecs])
        else:
            if BaseTrainer._concat_scalars_fn is None:
                BaseTrainer._concat_scalars_fn = jax.jit(
                    lambda vs: jnp.concatenate(vs))
            vals = np.asarray(BaseTrainer._concat_scalars_fn(vecs))
        out, i = [], 0
        for _, keys in groups:
            loss = float(vals[i])
            i += 1
            out.append((loss, {k: float(vals[i + j])
                               for j, k in enumerate(keys)}))
            i += len(keys)
        return out

    _tree_copy_fn = None

    def _tree_copy(self, tree):
        """Whole-pytree device copy as one compiled dispatch."""
        if self._tree_copy_fn is None:
            self._tree_copy_fn = jax.jit(
                lambda t: jax.tree.map(jnp.copy, t))
        return self._tree_copy_fn(tree)

    # ----------------------------------------- device-cached epoch paths
    def _cache_put(self, x):
        """Tiny per-epoch host arrays (index/weight plans) -> device."""
        if self.mesh.size == 1 and jax.process_count() == 1:
            return jnp.asarray(x)  # uncommitted (axon fast path)
        rep = replicated_sharding(self.mesh)
        if jax.process_count() == 1:
            return jax.device_put(x, rep)
        # multi-host: device_put cannot target non-addressable devices;
        # every process passes the SAME host value (plans derive from the
        # shared seed) and contributes its local replicas.
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep,
                                            lambda index: x[index])

    def _cache_plan_rows(self, loader) -> np.ndarray:
        """Index rows the cached device programs consume for ``loader``'s
        current epoch: the GLOBAL plan under multi-host (the device cache
        holds global rows; the in-step gather emits the global batch
        sharded over "data"), the process plan otherwise (identical when
        single-process)."""
        if loader.num_processes > 1:
            return loader.global_epoch_plan()[0]
        return loader.epoch_plan()[0]

    def _gather_fn(self):
        """In-graph batch assembly from the device cache for batch ``b``
        (weights already derived in-graph by the caller)."""
        mesh = self.mesh
        bsh = batch_sharding(mesh) if mesh.size > 1 else None

        def gather(cache, idx_mat, w, b):
            idx = jax.lax.dynamic_index_in_dim(idx_mat, b, keepdims=False)
            batch = cache.gather(idx, w)
            if bsh is not None:
                batch = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, bsh),
                    batch)
            return batch

        return gather

    def _in_graph_weights(self, loader):
        """Per-batch sample weights computed IN-GRAPH from the loader's
        static geometry — bit-identical to ``epoch_plan``'s weight rows
        (zeros exactly on the final batch's wrap-around padding columns)
        without uploading anything. Multi-host: global-width rows to
        match ``_cache_plan_rows``'s global plans."""
        n_batches = len(loader)
        bs_global = loader.batch_size
        if loader.num_processes > 1:
            local, lo = bs_global, 0
        else:
            local = loader.per_process_batch
            lo = loader.process_index * local
        pad = 0 if loader.drop_last else n_batches * bs_global - len(
            loader.dataset)
        cols = jnp.arange(local) + lo  # global column indices

        def weights_for(b):
            if pad == 0:
                return jnp.ones((local,), jnp.float32)
            is_last = (b == n_batches - 1)
            return jnp.where(is_last & (cols >= bs_global - pad), 0.0,
                             1.0).astype(jnp.float32)

        return weights_for

    def _train_window_fn(self, n_steps: int):
        """The UNJITTED body shared by the cached chunk and epoch-block
        programs: scan ``n_steps`` train steps from plan row ``start``,
        returning ``(state, sums, packed)`` — the packed scalar vector
        is emitted in-graph (``_packed_scalars_in_graph``) so callers
        need no separate pack dispatch (on the tunneled setup every
        launch costs a serialized host round trip)."""
        step_body = self._build_step_body()
        gather = self._gather_fn()
        weights_for = self._in_graph_weights(self.train_loader)
        n_batches = len(self.train_loader)
        dataset_size = float(len(self.train_dataset))

        def window_fn(state, cache, idx_mat, start, epoch):
            def body(state, i):
                b = start + i
                info = StepInfo(
                    epoch=epoch,
                    batch_ratio=b.astype(jnp.float32) / n_batches,
                    dataset_size=jnp.asarray(dataset_size, jnp.float32),
                )
                batch = gather(cache, idx_mat, weights_for(b), b)
                state, out = step_body(state, batch, info)
                return state, out

            state, outs = jax.lax.scan(body, state,
                                       jnp.arange(n_steps, dtype=jnp.int32))
            sums = jax.tree.map(lambda x: jnp.sum(x, axis=0), outs)
            return state, sums, _packed_scalars_in_graph(sums)

        return window_fn

    def _compiled_cached_train_chunk(self, n_steps: int):
        """One dispatch running ``n_steps`` train steps as a ``lax.scan``
        over on-device-gathered batches. Per dispatch the host sends only
        the scalars (start, epoch); the index plan is uploaded once per
        epoch and the weight rows are derived in-graph."""
        key = n_steps
        if key in self._cached_train_fns:
            return self._cached_train_fns[key]
        chunk_fn = self._train_window_fn(n_steps)

        if self.mesh.size == 1:
            fn = jax.jit(chunk_fn, donate_argnums=(0,))
        else:
            rep = replicated_sharding(self.mesh)
            state_sh = self._state_sharding(rep)
            # The cache keeps its OWN layout (row-sharded caches must not
            # be resharded to replicated at the jit boundary — that would
            # all-gather the dataset every dispatch).
            cache_sh = jax.tree.map(lambda x: x.sharding, self._train_cache)
            fn = jax.jit(
                chunk_fn, donate_argnums=(0,),
                in_shardings=(state_sh, cache_sh, rep, rep, rep),
                out_shardings=(state_sh, rep, rep),
            )
        self._cached_train_fns[key] = fn
        return fn

    def _plateau_update_fn(self):
        """In-graph mirror of ``optim.ReduceLROnPlateau._compute_lr``
        (same branch structure, f32): one epoch's update of the carried
        state vector ``[current_lr, best, num_bad_epochs,
        cooldown_counter]`` given the epoch's comparison loss. Static
        config (mode/threshold/patience/...) is baked at trace time;
        only the four scalars and the metric are traced. The host
        adopts the carry at sync-finalize epochs
        (``_adopt_sched_carry``), so checkpointed scheduler state is
        bit-exactly the device's. Reference semantics:
        torch.optim.lr_scheduler.ReduceLROnPlateau, used by the
        reference's benchmark protocol."""
        s = self.scheduler
        is_min = s.mode == "min"
        rel = s.threshold_mode == "rel"
        th = float(s.threshold)
        factor = float(s.factor)
        patience = float(s.patience)
        cooldown_cfg = float(s.cooldown)
        min_lr = float(s.min_lr)
        eps = float(getattr(s, "eps", 1e-8))

        def update(sched, metric):
            # Exact mirror of the host _compute_lr (torch step):
            # better/cooldown updates are INDEPENDENT, then patience.
            lr, best, bad, cool = sched[0], sched[1], sched[2], sched[3]
            if is_min:
                better = (metric < best * (1.0 - th) if rel
                          else metric < best - th)
            else:
                better = (metric > best * (1.0 + th) if rel
                          else metric > best + th)
            best2 = jnp.where(better, metric, best)
            bad1 = jnp.where(better, 0.0, bad + 1.0)
            in_cool = cool > 0.0
            bad2 = jnp.where(in_cool, 0.0, bad1)
            cool1 = jnp.where(in_cool, cool - 1.0, cool)
            trigger = bad2 > patience
            bad3 = jnp.where(trigger, 0.0, bad2)
            cool2 = jnp.where(trigger, jnp.float32(cooldown_cfg), cool1)
            new_lr = jnp.maximum(lr * factor, jnp.float32(min_lr))
            # torch ignores a reduction whose delta is <= eps
            # (counters still reset)
            apply_lr = jnp.logical_and(trigger, (lr - new_lr) > eps)
            lr2 = jnp.where(apply_lr, new_lr, lr)
            return jnp.stack([lr2, best2, bad3, cool2])

        return update

    def _compiled_cached_train_block(self, n_epochs: int):
        """One dispatch running ``n_epochs`` WHOLE train epochs as a
        single flat ``lax.scan`` over every (epoch, batch) step (nested
        while loops measured 1.42x slower on the v5e — see ``block_fn``),
        emitting one packed scalar vector per epoch.
        With the per-epoch launch already fused to one (chunk + in-graph
        pack), this drops launches BELOW one per epoch: a depth-8 block
        costs one launch + one plan upload + one (E, 1+k) fetch — on the
        tunneled setup each of those is a serialized ~30-45 ms host
        round trip, so per-epoch overhead falls to ~1/8th of it. Only
        used by the pipelined loop (no eval set, no update hook) where
        no host decision is needed between epochs.

        When ``_block_best_tracking`` is on (``keep_best_on_train`` or a
        ``start_keep_best_epoch`` warmup window, no eval set), the block
        carries ``(best_train_loss, best_params)`` IN-GRAPH and selects
        the snapshot with a ``where`` at each epoch boundary — the exact
        reference condition (``base_trainer.py:501-522``) evaluated in
        f32 on device — so best-model configs keep the one-launch-per-
        block rate instead of a per-epoch snapshot launch. Each packed
        row gains a trailing 0/1 "took" column the host replays for the
        reference's log lines and loss bookkeeping."""
        key = ("block", n_epochs)
        if key in self._cached_train_fns:
            return self._cached_train_fns[key]
        window_fn = self._train_window_fn(len(self.train_loader))
        track_best = self._block_best_tracking
        kbt = bool(self.training_config.keep_best_on_train)
        warm_until = float(self.start_keep_best_epoch)
        n_data = float(len(self.train_dataset))
        # Deterministic LR schedule: the host precomputes the block's
        # per-epoch LR vector (``lr_at``) and the program rewires the
        # injected hyperparam leaf at each epoch boundary — the exact
        # values the synchronous loop's ``scheduler.step()`` +
        # ``set_learning_rate`` sequence produces. A PLATEAU scheduler
        # instead carries its state vector in-graph and updates it from
        # each epoch's train loss (``_plateau_update_fn``); the trailing
        # ``sched`` argument is the LR vector in the first case, the
        # carry in the second.
        scheduled = (self.scheduler is not None
                     and self.scheduler.deterministic)
        plateau = (self.scheduler is not None
                   and not self.scheduler.deterministic)
        plateau_update = self._plateau_update_fn() if plateau else None

        def epoch_tail(best, state, epoch, packed):
            """Mirror of _finalize_epoch_host's tracking branch (no eval
            set): warmup epochs always snap (loss untouched); after the
            window, keep_best_on_train snaps on strict improvement."""
            best_loss, best_params = best
            loss = packed[0] / jnp.float32(n_data)
            warm = epoch <= jnp.float32(warm_until)
            if kbt:
                improved = jnp.logical_and(epoch > jnp.float32(warm_until),
                                           loss < best_loss)
            else:
                improved = jnp.zeros((), jnp.bool_)
            took = jnp.logical_or(warm, improved)
            best_loss = jnp.where(improved, loss, best_loss)
            best_params = jax.tree.map(
                lambda p, bp: jnp.where(took, p, bp),
                state.params, best_params)
            return (best_loss, best_params), took

        def block_best_fn(state, best, cache, idx_block, first_epoch,
                          sched=None):
            """Python-UNROLLED outer loop: n_epochs top-level step scans
            with the best-select between them. Not a nested lax.scan
            (the while-in-while tax, see ``block_fn``) and not a flat
            scan (the per-epoch params select would cost a full params
            copy per STEP inside one). Measured on the v5e
            (``scripts/ab_tracking_block.py``, depth 8): 314.8 ->
            205.8 us/step for +23% compile (26.5 -> 32.8 s) — the
            cloned epoch bodies compile nearly free because XLA
            deduplicates the repeated computations."""
            rows = []
            sums = None
            for e in range(n_epochs):
                epoch = first_epoch + jnp.float32(e)
                if scheduled:
                    state = _state_with_lr(state, sched[e])
                elif plateau:
                    state = _state_with_lr(state, sched[0])
                state, sums, packed = window_fn(
                    state, cache, idx_block[e], jnp.int32(0), epoch)
                best, took = epoch_tail(best, state, epoch, packed)
                rows.append(jnp.concatenate(
                    [packed, took.astype(jnp.float32)[None]]))
                if plateau:
                    sched = plateau_update(
                        sched, packed[0] / jnp.float32(n_data))
            # sums: only the pytree STRUCTURE is consumed (metric key
            # order of the packed columns) — the last epoch's tree
            if plateau:
                return state, best, jnp.stack(rows), sums, sched
            return state, best, jnp.stack(rows), sums

        def block_plateau_fn(state, cache, idx_block, first_epoch, sched):
            """Unrolled plateau-scheduled block WITHOUT best tracking:
            each epoch trains under the carried LR, then the carry
            updates from the epoch's train loss (the synchronous loop's
            ``_schedulers_step(epoch_train_loss)`` with no eval set)."""
            rows = []
            sums = None
            for e in range(n_epochs):
                epoch = first_epoch + jnp.float32(e)
                state = _state_with_lr(state, sched[0])
                state, sums, packed = window_fn(
                    state, cache, idx_block[e], jnp.int32(0), epoch)
                rows.append(packed)
                sched = plateau_update(sched, packed[0] / jnp.float32(n_data))
            return state, jnp.stack(rows), sums, sched

        def block_fn(state, cache, idx_block, first_epoch, lrs=None):
            """ONE flat scan over all n_epochs*n_batches steps, with the
            epoch / in-epoch batch index derived from the flat step
            index and per-epoch sums recovered by reshape. NOT a nested
            scan: on the v5e, an outer while-loop wrapping the inner
            step scan ran the SAME step body 1.42x slower than the flat
            formulation (313.8 vs 210.4 us/step, depth 8, idle chip,
            ``scripts/ab_block_vs_bare.py``) — a depth-1 outer scan
            costs nothing, so the tax is while-in-while pipelining, not
            the epoch bookkeeping. The best-tracking variant below
            unrolls the outer loop instead (it needs a params-tree
            select at each epoch boundary, which a flat scan would pay
            per step)."""
            n_batches = len(self.train_loader)
            n_total = n_epochs * n_batches
            idx_flat = idx_block.reshape(n_total, *idx_block.shape[2:])
            gather = self._gather_fn()
            weights_for = self._in_graph_weights(self.train_loader)
            step_body = self._build_step_body()
            dataset_size = float(len(self.train_dataset))

            def body(state, i):
                e = i // n_batches
                bb = i - e * n_batches
                if lrs is not None:
                    # per-STEP rewiring of the injected LR scalar — a
                    # dynamic index + wire swap, free in the flat scan
                    state = _state_with_lr(state, lrs[e])
                info = StepInfo(
                    epoch=first_epoch + e.astype(jnp.float32),
                    batch_ratio=bb.astype(jnp.float32) / n_batches,
                    dataset_size=jnp.asarray(dataset_size, jnp.float32),
                )
                batch = gather(cache, idx_flat, weights_for(bb), i)
                state, out = step_body(state, batch, info)
                return state, out

            state, outs = jax.lax.scan(
                body, state, jnp.arange(n_total, dtype=jnp.int32))
            sums = jax.tree.map(
                lambda x: jnp.sum(
                    x.reshape(n_epochs, n_batches, *x.shape[1:]), axis=1),
                outs)
            packed_rows = jax.vmap(_packed_scalars_in_graph)(sums)
            # Only the pytree STRUCTURE of sums is consumed (the metric
            # key order of the packed columns) — return the last epoch's
            # row so the launch creates n_metrics output buffers, not
            # n_epochs x n_metrics (the flush fetches packed_rows alone).
            return state, packed_rows, jax.tree.map(lambda x: x[-1], sums)

        lr_arg = ((replicated_sharding(self.mesh),)
                  if (scheduled or plateau) else ())
        if self.mesh.size == 1:
            if track_best:
                fn = jax.jit(block_best_fn, donate_argnums=(0, 1))
            elif plateau:
                fn = jax.jit(block_plateau_fn, donate_argnums=(0,))
            else:
                fn = jax.jit(block_fn, donate_argnums=(0,))
        else:
            rep = replicated_sharding(self.mesh)
            state_sh = self._state_sharding(rep)
            cache_sh = jax.tree.map(lambda x: x.sharding, self._train_cache)
            if track_best:
                best_sh = (rep, self._params_sharding(rep))
                fn = jax.jit(
                    block_best_fn, donate_argnums=(0, 1),
                    in_shardings=(state_sh, best_sh, cache_sh, rep, rep)
                    + lr_arg,
                    out_shardings=(state_sh, best_sh, rep, rep)
                    + ((rep,) if plateau else ()),
                )
            elif plateau:
                fn = jax.jit(
                    block_plateau_fn, donate_argnums=(0,),
                    in_shardings=(state_sh, cache_sh, rep, rep, rep),
                    out_shardings=(state_sh, rep, rep, rep),
                )
            else:
                fn = jax.jit(
                    block_fn, donate_argnums=(0,),
                    in_shardings=(state_sh, cache_sh, rep, rep) + lr_arg,
                    out_shardings=(state_sh, rep, rep),
                )
        self._cached_train_fns[key] = fn
        return fn

    def _compiled_cached_train_eval_block(self, n_epochs: int):
        """One dispatch running ``n_epochs`` whole (train epoch -> eval
        epoch -> best-model select) cycles — the COMMON configuration
        (an eval set) at fused-block launch rates. Python-unrolled
        outer loop (nested scans pay the v5e while-in-while tax, flat
        scans can't afford the per-epoch params select — see
        ``block_fn``/``block_best_fn``). The eval pass runs in-graph on
        the post-epoch params under the SAME per-epoch rng the host
        eval loop derives (the epoch keys come in as key DATA built
        host-side with ``jax.random.key(seed + 1000 + epoch)``, so the
        device consumes bit-identical randomness), and the best-model
        decision is the reference's epoch tail
        (``src/multivae/trainers/base/base_trainer.py:480-577``: the
        warmup window always snaps, then eval-loss improvement — or
        train-loss when ``keep_best_on_train``) evaluated in f32 on
        device. Returns per-epoch packed train rows, packed eval rows
        with a trailing 0/1 "took" column, and both sums trees (their
        STRUCTURE gives the metric key order)."""
        key = ("block_eval", n_epochs)
        if key in self._cached_train_fns:
            return self._cached_train_fns[key]
        train_window = self._train_window_fn(len(self.train_loader))
        eval_window = self._eval_window_fn(len(self.eval_loader))
        kbt = bool(self.training_config.keep_best_on_train)
        warm_until = float(self.start_keep_best_epoch)
        n_tr = float(len(self.train_dataset))
        n_ev = float(len(self.eval_dataset))

        def epoch_tail(best, state, epoch, packed_tr, packed_ev):
            """Mirror of _finalize_epoch_host's tracking branch with an
            eval set: warmup epochs always snap; afterwards the snap is
            on strict improvement of the comparison loss (eval loss, or
            train loss under keep_best_on_train)."""
            best_loss, best_params = best
            cmp_loss = (packed_tr[0] / jnp.float32(n_tr) if kbt
                        else packed_ev[0] / jnp.float32(n_ev))
            warm = epoch <= jnp.float32(warm_until)
            improved = jnp.logical_and(epoch > jnp.float32(warm_until),
                                       cmp_loss < best_loss)
            took = jnp.logical_or(warm, improved)
            best_loss = jnp.where(improved, cmp_loss, best_loss)
            best_params = jax.tree.map(
                lambda p, bp: jnp.where(took, p, bp),
                state.params, best_params)
            return (best_loss, best_params), took

        scheduled = (self.scheduler is not None
                     and self.scheduler.deterministic)
        plateau = (self.scheduler is not None
                   and not self.scheduler.deterministic)
        plateau_update = self._plateau_update_fn() if plateau else None

        def block_fn(state, best, tcache, ecache, idx_tr, idx_ev,
                     eval_keys, first_epoch, sched=None):
            # eval_keys is the WHOLE-RUN (num_epochs, key_size) table,
            # uploaded once (a per-block device_put would queue behind
            # the in-flight previous block on the serialized tunnel);
            # each epoch slices its own row. ``sched`` is the
            # deterministic per-epoch LR vector, or the plateau state
            # carry (updated from each epoch's EVAL loss — the
            # synchronous loop's ``_schedulers_step(epoch_eval_loss)``).
            first_i = first_epoch.astype(jnp.int32)
            rows_t, rows_e = [], []
            tsums = esums = None
            for e in range(n_epochs):
                epoch = first_epoch + jnp.float32(e)
                if scheduled:
                    state = _state_with_lr(state, sched[e])
                elif plateau:
                    state = _state_with_lr(state, sched[0])
                state, tsums, packed_t = train_window(
                    state, tcache, idx_tr[e], jnp.int32(0), epoch)
                rng = jax.random.wrap_key_data(
                    jax.lax.dynamic_index_in_dim(
                        eval_keys, first_i + (e - 1), keepdims=False))
                esums, packed_e = eval_window(
                    state.params, ecache, idx_ev[e], jnp.int32(0), rng,
                    epoch)
                best, took = epoch_tail(best, state, epoch, packed_t,
                                        packed_e)
                rows_t.append(packed_t)
                rows_e.append(jnp.concatenate(
                    [packed_e, took.astype(jnp.float32)[None]]))
                if plateau:
                    sched = plateau_update(
                        sched, packed_e[0] / jnp.float32(n_ev))
            # sums trees: only the pytree STRUCTURE is consumed (metric
            # key order of the packed columns) — the last epoch's trees
            if plateau:
                return (state, best, jnp.stack(rows_t), jnp.stack(rows_e),
                        tsums, esums, sched)
            return (state, best, jnp.stack(rows_t), jnp.stack(rows_e),
                    tsums, esums)

        if self.mesh.size == 1:
            fn = jax.jit(block_fn, donate_argnums=(0, 1))
        else:
            rep = replicated_sharding(self.mesh)
            state_sh = self._state_sharding(rep)
            tcache_sh = jax.tree.map(lambda x: x.sharding,
                                     self._train_cache)
            ecache_sh = jax.tree.map(lambda x: x.sharding,
                                     self._eval_cache)
            best_sh = (rep, self._params_sharding(rep))
            lr_arg = (rep,) if (scheduled or plateau) else ()
            fn = jax.jit(
                block_fn, donate_argnums=(0, 1),
                in_shardings=(state_sh, best_sh, tcache_sh, ecache_sh,
                              rep, rep, rep, rep) + lr_arg,
                out_shardings=(state_sh, best_sh, rep, rep, rep, rep)
                + ((rep,) if plateau else ()),
            )
        self._cached_train_fns[key] = fn
        return fn

    def _eval_window_fn(self, n_steps: int):
        """UNJITTED eval window shared by the cached eval chunk and the
        fused train+eval block: scan ``n_steps`` eval batches from plan
        row ``start`` under one epoch rng, returning ``(sums, packed)``."""
        eval_body = self._build_eval_body()
        gather = self._gather_fn()
        weights_for = self._in_graph_weights(self.eval_loader)
        dataset_size = float(len(self.eval_dataset))

        def window_fn(params, cache, idx_mat, start, rng, epoch):
            def body(_, i):
                b = start + i
                # mirrors the host eval loop: one rng for the whole
                # epoch, batch_ratio left at 0
                info = StepInfo(
                    epoch=epoch,
                    batch_ratio=jnp.asarray(0.0, jnp.float32),
                    dataset_size=jnp.asarray(dataset_size, jnp.float32),
                )
                batch = gather(cache, idx_mat, weights_for(b), b)
                return None, eval_body(params, batch, rng, info)

            _, outs = jax.lax.scan(body, None,
                                   jnp.arange(n_steps, dtype=jnp.int32))
            sums = jax.tree.map(lambda x: jnp.sum(x, axis=0), outs)
            return sums, _packed_scalars_in_graph(sums)

        return window_fn

    def _compiled_cached_eval_chunk(self, n_steps: int):
        key = n_steps
        if key in self._cached_eval_fns:
            return self._cached_eval_fns[key]
        chunk_fn = self._eval_window_fn(n_steps)

        if self.mesh.size == 1:
            fn = jax.jit(chunk_fn)
        else:
            rep = replicated_sharding(self.mesh)
            cache_sh = jax.tree.map(lambda x: x.sharding, self._eval_cache)
            fn = jax.jit(
                chunk_fn,
                in_shardings=(self._params_sharding(rep), cache_sh, rep,
                              rep, rep, rep),
                out_shardings=(rep, rep),
            )
        self._cached_eval_fns[key] = fn
        return fn

    def _upload_epoch_plan(self, which: str, loader, epoch: int):
        """Device copy of the loader's epoch index plan. shuffle=False
        loaders reuse ONE uploaded plan for every epoch; shuffled
        loaders upload a BLOCK of ``pipeline_depth`` consecutive
        epochs' plans in one host->device transfer (each transfer costs
        a full ~29 ms device-queue round trip through the tunnel
        regardless of size — the plans are tiny — so batching divides
        that latency by the block size) and serve per-epoch device
        slices from it. The cached-epoch runners request the NEXT
        epoch's plan right after dispatching the current one, so block
        uploads ride under device compute instead of idling it."""
        key = (which, epoch if loader.shuffle else -1)
        dev = self._plan_cache.get(key)
        if dev is None:
            if not loader.shuffle:
                loader.set_epoch(epoch)
                idx_mat = self._cache_plan_rows(loader)
                dev = self._cache_put(idx_mat)
                self._plan_cache[key] = dev
                return dev
            block_n = max(1, getattr(self.training_config,
                                     "pipeline_depth", 1))
            last = self.training_config.num_epochs
            epochs = list(range(epoch, min(epoch + block_n, last + 1)))
            if not epochs:
                epochs = [epoch]
            mats = []
            for e in epochs:
                loader.set_epoch(e)
                mats.append(self._cache_plan_rows(loader))
            block = self._cache_put(np.stack(mats))
            # Unstack in ONE jitted program — eager per-epoch slicing
            # costs a tunnel round trip per slice (~35 ms each).
            slices = self._unstack_fn(len(epochs))(block)
            for e, s in zip(epochs, slices):
                self._plan_cache[(which, e)] = s
            dev = self._plan_cache[key]
        return dev

    _unstack_fns = {}

    @staticmethod
    def _unstack_fn(n: int):
        fn = BaseTrainer._unstack_fns.get(n)
        if fn is None:
            fn = jax.jit(lambda b: [b[i] for i in range(n)])
            BaseTrainer._unstack_fns[n] = fn
        return fn

    def _evict_epoch_plan(self, which: str, loader, epoch: int):
        if loader.shuffle:
            self._plan_cache.pop((which, epoch), None)

    def _run_cached_train_epoch(self, epoch: int):
        """Epoch over the HBM-resident dataset: uploads only the tiny
        (n_batches, B) index plan once, then dispatches
        ``steps_per_execution``-step scans carrying two scalars each."""
        idx_dev = self._upload_epoch_plan("train", self.train_loader, epoch)
        self.train_loader.set_epoch(epoch)
        n_batches = len(self.train_loader)
        epoch_arr = np.float32(epoch)
        chunk = self.training_config.steps_per_execution

        loss_sum_total = None
        metric_sums = {}
        packed = None
        n_chunks = 0
        b = 0
        while b < n_batches:
            n = min(chunk, n_batches - b)
            fn = self._compiled_cached_train_chunk(n)
            self.state, out, packed = fn(self.state, self._train_cache,
                                         idx_dev, np.int32(b), epoch_arr)
            n_chunks += 1
            loss_sum_total = (
                out["loss_sum"] if loss_sum_total is None
                else loss_sum_total + out["loss_sum"]
            )
            update_dict(metric_sums, out["metrics"])
            for _ in range(n):
                self.callback_handler.on_train_step_end(self.training_config)
            b += n
        # The device is busy with the epoch's chunks now — upload the
        # next epoch's plan so the transfer rides under the compute.
        if epoch < self.training_config.num_epochs:
            self._upload_epoch_plan("train", self.train_loader, epoch + 1)
        self._evict_epoch_plan("train", self.train_loader, epoch)
        # Single-chunk epochs carry their packed scalar vector out of the
        # chunk program itself — no separate pack dispatch needed.
        fused = (packed, sorted(metric_sums)) if n_chunks == 1 else None
        return loss_sum_total, metric_sums, fused

    def _run_cached_eval_epoch(self, epoch: int):
        idx_dev = self._upload_epoch_plan("eval", self.eval_loader, epoch)
        self.eval_loader.set_epoch(epoch)
        n_batches = len(self.eval_loader)
        epoch_arr = np.float32(epoch)
        rng = jax.random.key(self.training_config.seed + 1000 + epoch)
        chunk = self.training_config.steps_per_execution

        loss_sum_total = None
        metric_sums = {}
        packed = None
        n_chunks = 0
        b = 0
        while b < n_batches:
            n = min(chunk, n_batches - b)
            fn = self._compiled_cached_eval_chunk(n)
            out, packed = fn(self.state.params, self._eval_cache, idx_dev,
                             np.int32(b), rng, epoch_arr)
            n_chunks += 1
            loss_sum_total = (
                out["loss_sum"] if loss_sum_total is None
                else loss_sum_total + out["loss_sum"]
            )
            update_dict(metric_sums, out["metrics"])
            for _ in range(n):
                self.callback_handler.on_eval_step_end(self.training_config)
            b += n
        if epoch < self.training_config.num_epochs:
            self._upload_epoch_plan("eval", self.eval_loader, epoch + 1)
        self._evict_epoch_plan("eval", self.eval_loader, epoch)
        fused = (packed, sorted(metric_sums)) if n_chunks == 1 else None
        return loss_sum_total, metric_sums, fused

    # ------------------------------------------ fused whole-epoch blocks
    @property
    def _block_best_tracking(self) -> bool:
        """Best-model tracking that the fused-block program can carry
        IN-GRAPH: an eval set (the train+eval block tracks the eval
        loss — the reference's default criterion), or, without one,
        ``keep_best_on_train`` / a ``start_keep_best_epoch`` warmup
        window."""
        return (self.eval_dataset is not None
                or self.training_config.keep_best_on_train
                or self.start_keep_best_epoch >= 1)

    @property
    def _block_eval_fused(self) -> bool:
        """Whether fused blocks run the train+eval program (an eval set
        whose cache built and whose epoch fits one chunk)."""
        return (self.eval_dataset is not None
                and self._eval_cache is not None
                and (self.training_config.steps_per_execution
                     >= len(self.eval_loader)))

    def _fused_epoch_blocks_eligible(self) -> bool:
        """Whole-epoch-block fusion (``_compiled_cached_train_block`` /
        ``_compiled_cached_train_eval_block``) needs: the device
        cache(s), full-epoch chunks, and NO per-epoch host decision —
        no model ``update`` hook (schedulers/subclass hooks are already
        excluded by ``_pipeline_epochs_eligible``). Best-model tracking
        is NOT a host decision anymore: the block program carries
        ``(best_loss, best_params)`` in-graph (``_block_best_tracking``)
        — eval-loss tracking via the train+eval block, train-loss /
        warmup-window tracking via the train-only block. Each distinct
        block length is its own whole-model XLA compile (expensive on
        this box), so short runs — under two pipeline depths of
        remaining epochs — stay on the per-epoch program, whose single
        chunk compile they need anyway."""
        cfg = self.training_config
        remaining = cfg.num_epochs - self.trained_epochs
        return (self._train_cache is not None
                and (self.eval_dataset is None or self._block_eval_fused)
                and type(self.model).update is BaseModel.update
                and cfg.steps_per_execution >= len(self.train_loader)
                and remaining >= 2 * max(1, cfg.pipeline_depth))

    def _upload_epoch_plan_block(self, loader, epochs, which="train"):
        """Stacked (E, n_batches, B) device plan for a fused epoch
        block. shuffle=False loaders reuse ONE uploaded stack per block
        length for the whole run (every epoch's plan is identical);
        shuffled blocks are single-use and uploaded fresh."""
        if not loader.shuffle:
            key = (which + "_block", len(epochs))
            dev = self._plan_cache.get(key)
            if dev is None:
                loader.set_epoch(epochs[0])
                m = self._cache_plan_rows(loader)
                dev = self._cache_put(np.stack([m] * len(epochs)))
                self._plan_cache[key] = dev
            return dev
        mats = []
        for e in epochs:
            loader.set_epoch(e)
            mats.append(self._cache_plan_rows(loader))
        return self._cache_put(np.stack(mats))

    def _run_cached_train_epoch_block(self, epochs):
        """Dispatch ``len(epochs)`` whole epochs as ONE launch. Returns
        ``(packed_rows, keys, eval_rows, ekeys)``: a device
        (E, 1+n_metrics) scalar matrix per pass (one row per epoch,
        fetched later in one transfer; the 0/1 "took" tracking column
        trails the train rows — or the eval rows in train+eval mode)
        and the metric key order of the columns. ``eval_rows``/``ekeys``
        are None without an eval set."""
        idx_block = self._upload_epoch_plan_block(self.train_loader, epochs)
        lr_arg = ()
        plateau = False
        if self.scheduler is not None:
            if self.scheduler.deterministic:
                # The block's per-epoch LR vector, computed with the
                # same f64 host arithmetic the synchronous
                # ``scheduler.step()`` path uses and cast f32 once —
                # epoch e trains under lr_at(e-1-base), the base
                # anchoring a scheduler re-seated by a multistage reset.
                lr_arg = (np.asarray(
                    [self.scheduler.lr_at(e - 1 - self._sched_epoch_base)
                     for e in epochs],
                    dtype=np.float32),)
            else:
                # Plateau: the device-resident state carry threads
                # block-to-block; the host adopts it at sync-finalize
                # epochs (_adopt_sched_carry).
                plateau = True
                lr_arg = (self._sched_carry,)
        eval_rows = ekeys = None
        if self._block_eval_fused:
            idx_eval = self._upload_epoch_plan_block(
                self.eval_loader, epochs, which="eval")
            # the SAME per-epoch keys the host eval loop derives
            # (_run_cached_eval_epoch), shipped ONCE as a whole-run key
            # table (epoch e -> row e-1); the block slices its rows
            ekey_data = self._plan_cache.get("eval_keys")
            if ekey_data is None:
                # ONE dispatch + ONE fetch for the whole-run key table:
                # a per-epoch eager jax.random.key + key_data fetch
                # would cost num_epochs serialized tunnel round trips
                # (vmapped key construction is bit-identical to the
                # scalar calls — pure seed bit-packing)
                seed = self.training_config.seed
                seeds = np.arange(1, self.training_config.num_epochs + 1,
                                  dtype=np.int64) + (1000 + seed)
                table = np.asarray(jax.jit(
                    lambda s: jax.random.key_data(
                        jax.vmap(jax.random.key)(s)))(seeds))
                ekey_data = self._cache_put(table)
                self._plan_cache["eval_keys"] = ekey_data
            fn = self._compiled_cached_train_eval_block(len(epochs))
            out = fn(
                self.state, self._block_best, self._train_cache,
                self._eval_cache, idx_block, idx_eval, ekey_data,
                np.float32(epochs[0]), *lr_arg)
            if plateau:
                (self.state, self._block_best, packed_rows, eval_rows,
                 sums, esums, self._sched_carry) = out
            else:
                (self.state, self._block_best, packed_rows, eval_rows,
                 sums, esums) = out
            ekeys = sorted(esums["metrics"])
            if hasattr(eval_rows, "copy_to_host_async"):
                try:
                    eval_rows.copy_to_host_async()
                except Exception:  # pragma: no cover - optional hint
                    pass
        elif self._block_best_tracking:
            fn = self._compiled_cached_train_block(len(epochs))
            out = fn(
                self.state, self._block_best, self._train_cache, idx_block,
                np.float32(epochs[0]), *lr_arg)
            if plateau:
                (self.state, self._block_best, packed_rows, sums,
                 self._sched_carry) = out
            else:
                self.state, self._block_best, packed_rows, sums = out
        elif plateau:
            fn = self._compiled_cached_train_block(len(epochs))
            self.state, packed_rows, sums, self._sched_carry = fn(
                self.state, self._train_cache, idx_block,
                np.float32(epochs[0]), *lr_arg)
        else:
            fn = self._compiled_cached_train_block(len(epochs))
            self.state, packed_rows, sums = fn(
                self.state, self._train_cache, idx_block,
                np.float32(epochs[0]), *lr_arg)
        # Enqueue the device->host copy of the block's scalar matrix NOW,
        # before the next block's program is dispatched: on serialized
        # transports (the tunneled TPU) a transfer requested at flush
        # time can queue behind the whole in-flight NEXT block, making
        # every lag-1 flush cost ~a block of device time. The later
        # np.asarray() then finds the bytes already staged (and is the
        # correctness path regardless — this is only a hint).
        if hasattr(packed_rows, "copy_to_host_async"):
            try:
                packed_rows.copy_to_host_async()
            except Exception:  # pragma: no cover - backend-optional hint
                pass
        return packed_rows, sorted(sums["metrics"]), eval_rows, ekeys

    def _finalize_epoch_block_host(self, epochs, packed_rows, keys,
                                   eval_rows=None, ekeys=None,
                                   file_logger=None):
        vals = np.asarray(packed_rows)  # ONE fetch for the whole block
        evals = np.asarray(eval_rows) if eval_rows is not None else None
        n_batches = len(self.train_loader)
        n_data = len(self.train_dataset)
        track = self._block_best_tracking
        kbt = bool(self.training_config.keep_best_on_train)
        for i, (e, row) in enumerate(zip(epochs, vals)):
            loss = float(row[0]) / n_data
            metrics = {k: float(row[1 + j]) / n_batches
                       for j, k in enumerate(keys)}
            eval_loss = eval_metrics = None
            in_graph_best = None
            if evals is not None:
                erow = evals[i]
                n_ev = len(self.eval_dataset)
                eval_loss = float(erow[0]) / n_ev
                eval_metrics = {k: float(erow[1 + j])
                                / len(self.eval_loader)
                                for j, k in enumerate(ekeys)}
                # Replay the device decision for the reference log
                # lines and loss bookkeeping: the trailing eval column
                # is the 0/1 "took" flag; the f32 division reproduces
                # the device's comparison value bit-exactly (same
                # operands, same IEEE op) so the host best loss == the
                # device carry.
                took = bool(erow[1 + len(ekeys)] > 0.5)
                cmp_f32 = (np.float32(row[0]) / np.float32(n_data) if kbt
                           else np.float32(erow[0]) / np.float32(n_ev))
                in_graph_best = (took, float(cmp_f32))
            elif track:
                # No eval set: the "took" column trails the TRAIN row
                # (same f32-replay contract as above).
                took = bool(row[1 + len(keys)] > 0.5)
                loss_f32 = np.float32(row[0]) / np.float32(n_data)
                in_graph_best = (took, float(loss_f32))
            self._finalize_epoch_host(e, loss, metrics, eval_loss,
                                      eval_metrics, None,
                                      file_logger=file_logger,
                                      in_graph_best=in_graph_best)

    def _init_block_best_carry(self):
        """Fresh on-device ``(best_loss, best_params)`` carry for the
        in-graph best tracking: a COPY (the block program donates its
        carry — aliasing ``_best_params``/``model.params`` would delete
        them on the first launch), placed with the params' training
        shardings on multi-device meshes. The loss slot holds the
        COMPARISON loss: train loss under ``keep_best_on_train`` (or
        without an eval set), eval loss otherwise."""
        base = (self._best_params if self._best_params is not None
                else self.state.params)
        kbt = self.training_config.keep_best_on_train
        loss0 = np.float32(
            self.best_train_loss if (kbt or self.eval_dataset is None)
            else self.best_eval_loss)
        if self.mesh.size == 1 and jax.process_count() == 1:
            return (jnp.asarray(loss0), self._tree_copy(base))
        rep = replicated_sharding(self.mesh)
        params0 = jax.jit(lambda t: jax.tree.map(jnp.copy, t),
                          out_shardings=self._params_sharding(rep))(base)
        return (self._cache_put(loss0), params0)

    def _materialize_block_best(self):
        """Refresh host-visible best state from the device carry at
        sync-finalize points (checkpoint/predict/last epoch) so
        ``best_params``/checkpoint saves read the tracked snapshot. A
        COPY: the carry is donated into the next block's launch."""
        if self._block_best is None:  # pragma: no cover - guarded call
            return
        self._best_params = self._tree_copy(self._block_best[1])

    def _train_fused_epoch_blocks(self, file_logger=None):
        """Pipelined loop over whole-epoch blocks: one launch + one plan
        upload per block of up to ``pipeline_depth`` epochs, finalized
        lag-1 (block N's scalars fetch while block N+1 computes). Blocks
        end early at checkpoint/prediction epochs, which finalize
        synchronously with refreshed ``model.params``."""
        cfg = self.training_config
        depth = max(1, cfg.pipeline_depth)
        n_batches = len(self.train_loader)
        last = cfg.num_epochs
        if self._block_best_tracking:
            self._block_best = self._init_block_best_carry()
        if self.scheduler is not None and not self.scheduler.deterministic:
            # Plateau state enters as a (4,) f32 vector and threads
            # device-to-device block-to-block; fresh/resumed host state
            # seeds it (scheduler.json restores exactly the f32 values
            # a previous run's carry held).
            self._seed_sched_carry()
            self._sched_in_graph = True
        blocks, cur = [], []
        for e in range(self.trained_epochs + 1, last + 1):
            cur.append(e)
            if (len(cur) >= depth or self._epoch_needs_sync_finalize(e)
                    or e == last):
                blocks.append(cur)
                cur = []
        resets = set(getattr(self.model, "reset_optimizer_epochs", [])
                     or [])
        prev = None
        for block in blocks:
            for e in block:
                self.best_train_loss, self.best_eval_loss = (
                    self.prepare_train_step(e, self.best_train_loss,
                                            self.best_eval_loss))
            if block[0] in resets:
                # A boundary optimizer reset (MultistageTrainer) swapped
                # the TrainState and cleared best tracking: re-seed the
                # donated in-graph carries from the fresh host state.
                # The block builders were invalidated by the hook, so
                # the new stage compiles its own block program.
                if self._block_best_tracking:
                    self._block_best = self._init_block_best_carry()
                if (self.scheduler is not None
                        and not self.scheduler.deterministic):
                    self._seed_sched_carry()
            payload = self._run_cached_train_epoch_block(block)
            # Display callbacks run their normal PER-EPOCH cycle (begin,
            # step ends) after the block dispatch — each progress bar
            # fills its own n_batches, in epoch order; only timing
            # shifts (as with all pipelined finalization).
            for e in block:
                self.callback_handler.on_epoch_begin(
                    cfg, epoch=e, train_loader=self.train_loader,
                    eval_loader=self.eval_loader)
                self.callback_handler.on_train_step_begin(
                    cfg, train_loader=self.train_loader, epoch=e)
                for _ in range(n_batches):
                    self.callback_handler.on_train_step_end(cfg)
                if payload[2] is not None:
                    self.callback_handler.on_eval_step_begin(
                        cfg, eval_loader=self.eval_loader, epoch=e)
                    for _ in range(len(self.eval_loader)):
                        self.callback_handler.on_eval_step_end(cfg)
            if prev is not None:
                self._finalize_epoch_block_host(*prev,
                                                file_logger=file_logger)
                prev = None
            if (self._epoch_needs_sync_finalize(block[-1])
                    or block[-1] == last):
                # predict / checkpoint / final save read fresh params
                self.model.params = self._tree_copy(self.state.params)
                if self._block_best_tracking:
                    self._materialize_block_best()
                self._adopt_sched_carry()
                self._finalize_epoch_block_host(block, *payload,
                                                file_logger=file_logger)
            else:
                prev = (block,) + payload
        if prev is not None:  # pragma: no cover - last block always syncs
            self.model.params = self._tree_copy(self.state.params)
            if self._block_best_tracking:
                self._materialize_block_best()
            self._adopt_sched_carry()
            self._finalize_epoch_block_host(*prev, file_logger=file_logger)

    def train_step(self, epoch: int):
        """One epoch over the train loader; returns (epoch_loss, metrics)."""
        packed = self._train_epoch_device(epoch)
        loss_sum, fetched = self._fetch_scalar_groups([packed])[0]
        epoch_loss = loss_sum / len(self.train_dataset)
        if np.isnan(epoch_loss) or np.isinf(epoch_loss):
            raise ArithmeticError("NaN detected in train loss")
        n_batches = len(self.train_loader)
        epoch_metrics = {k: v / n_batches for k, v in fetched.items()}
        return epoch_loss, epoch_metrics

    def _train_epoch_device(self, epoch: int, refresh_params: bool = True):
        """Dispatch one train epoch; returns the epoch's DEVICE-resident
        packed scalars ``(vec, keys)`` without forcing a device->host
        transfer (the pipelined ``train()`` loop overlaps that fetch
        with the next epoch's compute).

        ``refresh_params=False`` (pipelined loop only, and only when
        ``_needs_epoch_param_snapshot`` is False) skips the per-epoch
        whole-tree params copy: on the tunneled setup every launch
        costs a serialized host round trip, and when neither best-model
        tracking nor a model ``update`` hook can consume the snapshot,
        the copy is pure overhead — ``model.params`` is refreshed at
        sync-finalize epochs and the last epoch instead."""
        self.callback_handler.on_train_step_begin(
            self.training_config, train_loader=self.train_loader, epoch=epoch,
        )
        n_batches = len(self.train_loader)
        dataset_size = len(self.train_dataset)

        fused = None
        if self._train_cache is not None:
            loss_sum_total, metric_sums, fused = (
                self._run_cached_train_epoch(epoch))
        else:
            step_fn = self._compiled_train_step()
            self.train_loader.set_epoch(epoch)

            from ...data.prefetch import PrefetchLoader

            prefetched = PrefetchLoader(self.train_loader, self.mesh, depth=2)
            loss_sum_total = None
            metric_sums = {}
            for batch_idx, batch in enumerate(prefetched):
                info = StepInfo.create(
                    epoch=epoch, batch_ratio=batch_idx / n_batches,
                    dataset_size=dataset_size,
                )
                self.state, out = step_fn(self.state, batch, info)
                loss_sum_total = (
                    out["loss_sum"] if loss_sum_total is None
                    else loss_sum_total + out["loss_sum"]
                )
                update_dict(metric_sums, out["metrics"])
                self.callback_handler.on_train_step_end(self.training_config)

        if refresh_params:
            # Expose the updated params to the model (epoch-end hooks,
            # predict). Copy: the TrainState is donated every step, which
            # would otherwise delete these buffers out from under the
            # model. The copy runs as ONE jitted program — per-leaf
            # jnp.copy costs a dispatch per leaf (measured 54 ms/epoch
            # through the TPU tunnel vs ~3 ms fused).
            self.model.params = self._tree_copy(self.state.params)
            if type(self.model).update is not BaseModel.update:
                # The epoch-end self-update hook may mutate model.params —
                # propagate the result back into the (donated) TrainState.
                # Models with the default no-op hook skip the second copy
                # (one fused device program, ~3 ms/epoch on the tunnel).
                self.model.update()
                self.state = self.state.replace(
                    params=self._tree_copy(self.model.params)
                )
        if fused is not None:
            return fused
        return self._pack_epoch_scalars(loss_sum_total, metric_sums)

    def eval_step(self, epoch: int):
        """One epoch over the eval loader (no grad)."""
        packed = self._eval_epoch_device(epoch)
        loss_sum, fetched = self._fetch_scalar_groups([packed])[0]
        epoch_loss = loss_sum / len(self.eval_dataset)
        if np.isnan(epoch_loss) or np.isinf(epoch_loss):
            raise ArithmeticError("NaN detected in eval loss")
        n_batches = len(self.eval_loader)
        epoch_metrics = {k: v / n_batches for k, v in fetched.items()}
        return epoch_loss, epoch_metrics

    def _eval_epoch_device(self, epoch: int):
        """Dispatch one eval epoch; returns DEVICE-resident sums (see
        ``_train_epoch_device``)."""
        self.callback_handler.on_eval_step_begin(
            self.training_config, eval_loader=self.eval_loader, epoch=epoch,
        )
        dataset_size = len(self.eval_dataset)
        n_batches = len(self.eval_loader)

        fused = None
        if self._eval_cache is not None:
            loss_sum_total, metric_sums, fused = (
                self._run_cached_eval_epoch(epoch))
        else:
            eval_fn = self._compiled_eval_step()
            rng = jax.random.key(self.training_config.seed + 1000 + epoch)

            from ...data.prefetch import PrefetchLoader

            prefetched = PrefetchLoader(self.eval_loader, self.mesh, depth=2)
            loss_sum_total = None
            metric_sums = {}
            for batch in prefetched:
                info = StepInfo.create(epoch=epoch, dataset_size=dataset_size)
                out = eval_fn(self.state.params, batch, rng, info)
                loss_sum_total = (
                    out["loss_sum"] if loss_sum_total is None
                    else loss_sum_total + out["loss_sum"]
                )
                update_dict(metric_sums, out["metrics"])
                self.callback_handler.on_eval_step_end(self.training_config)

        if fused is not None:
            return fused
        return self._pack_epoch_scalars(loss_sum_total, metric_sums)

    @property
    def _needs_epoch_param_snapshot(self) -> bool:
        """Whether the per-epoch post-epoch params snapshot
        (``model.params = _tree_copy(state.params)``) has any consumer:
        best-model tracking (an eval set, ``keep_best_on_train``, or a
        ``start_keep_best_epoch`` warmup window) or a model ``update``
        hook. When False, the pipelined loop skips the per-epoch copy
        launch and refreshes ``model.params`` only at sync-finalize
        epochs and the last epoch."""
        return (self.eval_dataset is not None
                or self.training_config.keep_best_on_train
                or self.start_keep_best_epoch >= 1
                or type(self.model).update is not BaseModel.update)

    def _schedulers_step(self, metric=None):
        if self.scheduler is None:
            return
        if self._sched_in_graph:
            # Plateau-in-block mode: the device carry already applied
            # this epoch's update; host state is adopted from the carry
            # at sync-finalize epochs (_adopt_sched_carry). Only the
            # epoch counter advances here.
            self.scheduler.last_epoch += 1
            return
        new_lr = self.scheduler.step(metric)
        set_learning_rate(self.state.opt_state, new_lr)

    def _seed_sched_carry(self):
        """(Re)build the fused-block plateau carry from the host
        scheduler state — at loop entry (fresh/resumed scheduler) and
        after a multistage boundary reset re-seats it."""
        s = self.scheduler
        self._sched_carry = np.asarray(
            [s.current_lr, s.best, s.num_bad_epochs, s.cooldown_counter],
            dtype=np.float32)

    def _adopt_sched_carry(self):
        """Fetch the fused-block plateau carry and write it into the
        host scheduler (and the injected LR slot) so checkpoint saves
        and ``current_learning_rate`` read the device's state — the f32
        values ARE the state (no host-side recompute, no f64/f32
        drift)."""
        if self._sched_carry is None:
            return
        lr, best, bad, cool = np.asarray(self._sched_carry)
        s = self.scheduler
        s.current_lr = float(lr)
        s.best = float(best)
        s.num_bad_epochs = int(bad)
        s.cooldown_counter = int(cool)
        set_learning_rate(self.state.opt_state, float(lr))

    @property
    def current_learning_rate(self) -> float:
        return get_learning_rate(self.state.opt_state)

    def _pipeline_epochs_eligible(self) -> bool:
        """Deferred epoch finalization is safe only when nothing on the host
        needs epoch N's results before epoch N+1's device work is
        dispatched: no metric-driven LR scheduler (``ReduceLROnPlateau``
        steps on the epoch loss — DETERMINISTIC schedules are a pure
        function of the epoch number, so each epoch's LR is known at
        dispatch time via ``LRScheduler.lr_at`` and pipelining stays on;
        the deferred finalize replays ``scheduler.step()`` for host
        bookkeeping with identical values), no subclass epoch hooks (the
        MultistageTrainer's ``prepare_train_step`` resets the optimizer
        from loop state; overridden ``train_step``/``eval_step`` must
        keep running through the public synchronous path), and no
        callback with a custom ``on_epoch_end`` — that hook fires at
        flush time, when a closure reading
        ``trainer.state``/``model.params`` would see a LATER epoch's
        weights (the shipped display-only progress/console callbacks are
        exempt; ``JaxProfilerCallback`` intentionally is not, so
        profiled runs keep exact per-epoch attribution)."""
        if self.scheduler is not None and not self.scheduler.deterministic:
            return False
        return self._deferred_finalize_safe()

    def _deferred_finalize_safe(self) -> bool:
        """The scheduler-independent half of the pipelining eligibility:
        no subclass hooks, no custom ``on_epoch_end`` callbacks, config
        opt-in. Shared with ``_plateau_block_mode`` (a plateau scheduler
        can't pipeline per-epoch dispatch — each epoch's LR depends on
        the previous epoch's loss — but CAN ride whole-epoch blocks with
        its state carried in-graph)."""
        if not getattr(self.training_config, "pipeline_epochs", True):
            return False
        cls = type(self)
        if not (cls.train_step is BaseTrainer.train_step
                and cls.eval_step is BaseTrainer.eval_step):
            return False
        if self._prepare_boundaries_set() is None:
            # a subclass prepare_train_step with no declared boundary
            # epochs is an arbitrary per-epoch host decision
            return False
        deferred_safe = (ProgressBarCallback, MetricConsolePrinterCallback)
        for cb in getattr(self.callback_handler, "callbacks", []):
            if isinstance(cb, deferred_safe):
                continue
            if type(cb).on_epoch_end is not TrainingCallback.on_epoch_end:
                return False
        return True

    def _plateau_block_mode(self) -> bool:
        """ReduceLROnPlateau consumes each epoch's loss, so per-epoch
        pipelined dispatch is impossible — but the fused epoch-block
        programs compute that loss IN-GRAPH, so the plateau state
        ``(current_lr, best, num_bad_epochs, cooldown_counter)`` rides
        the block as an f32 carry: each epoch trains under the carried
        LR and the update (the exact mirror of the host
        ``ReduceLROnPlateau._compute_lr`` branch structure, in f32) runs
        after the epoch's (eval, else train) loss. The host ADOPTS the
        device carry at sync-finalize epochs, so checkpointed scheduler
        state matches the device bit-exactly. This is the reference's
        own benchmark protocol configuration
        (``examples/case_studies/benchmarking_on_partial_polymnist/global_config.py:29-67``:
        plateau on eval loss + best-on-eval), kept at fused-block launch
        rates."""
        return (self.scheduler is not None
                and not self.scheduler.deterministic
                and self._deferred_finalize_safe())

    def _prepare_boundaries(self):
        """Epochs at which ``prepare_train_step`` performs real work (a
        stage flip or an optimizer reset). ``set()`` for the base no-op
        hook; ``None`` when a subclass overrides the hook without
        declaring its boundaries (which disables pipelining — the hook
        could then be an arbitrary per-epoch host decision). The
        MultistageTrainer overrides this with the STATIC boundary set
        derived from the model's ``reset_optimizer_epochs`` /
        ``stage_for_epoch``, which lets two-stage training ride the
        pipelined and fused-block paths WITHIN each stage."""
        if (type(self).prepare_train_step
                is BaseTrainer.prepare_train_step):
            return set()
        return None

    def _prepare_boundaries_set(self):
        if not hasattr(self, "_pb_cache"):
            self._pb_cache = self._prepare_boundaries()
        return self._pb_cache

    def _epoch_needs_sync_finalize(self, epoch: int) -> bool:
        """Checkpoint and prediction epochs consume the CURRENT
        TrainState / model params on the host, so their finalization
        cannot lag behind the device — as does the epoch preceding a
        ``prepare_train_step`` boundary (the boundary's optimizer reset
        reads ``best_params`` and checkpoints epoch-1's state)."""
        cfg = self.training_config
        if cfg.steps_saving is not None and epoch % cfg.steps_saving == 0:
            return True
        if (epoch + 1) in (self._prepare_boundaries_set() or ()):
            return True
        return (cfg.steps_predict is not None
                and (epoch % cfg.steps_predict == 0 or epoch == 1))

    def _finalize_epochs(self, entries, file_logger=None,
                         staged: bool = False):
        """Host side of a RUN of deferred epochs: fetch every entry's
        packed device scalar vector (``_pack_epoch_scalars``) in ONE
        device->host transfer (or from the host-staged async copies when
        ``staged``), then run each epoch's host logic in order. Entries
        are ``(epoch, train_sums, eval_sums, candidate_params)``
        tuples."""
        groups = []
        for _, train_sums, eval_sums, _ in entries:
            groups.append(train_sums)
            if eval_sums is not None:
                groups.append(eval_sums)
        fetched = self._fetch_scalar_groups(groups, staged=staged)
        i = 0
        for epoch, train_sums, eval_sums, candidate_params in entries:
            # Normalize with the SAME arithmetic as train_step/eval_step
            # so pipelined and synchronous runs log bit-identical values.
            t_loss_sum, t_metrics = fetched[i]
            i += 1
            epoch_train_loss = t_loss_sum / len(self.train_dataset)
            train_metrics = {k: v / len(self.train_loader)
                             for k, v in t_metrics.items()}
            epoch_eval_loss = eval_metrics = None
            if eval_sums is not None:
                e_loss_sum, e_metrics = fetched[i]
                i += 1
                epoch_eval_loss = e_loss_sum / len(self.eval_dataset)
                eval_metrics = {k: v / len(self.eval_loader)
                                for k, v in e_metrics.items()}
            self._finalize_epoch_host(epoch, epoch_train_loss, train_metrics,
                                      epoch_eval_loss, eval_metrics,
                                      candidate_params,
                                      file_logger=file_logger)

    def _finalize_epoch_host(self, epoch, epoch_train_loss, train_metrics,
                             epoch_eval_loss, eval_metrics,
                             candidate_params, file_logger=None,
                             in_graph_best=None):
        """Host logic of one epoch's tail given NORMALIZED epoch values
        (the shape ``train_step``/``eval_step`` return): NaN guards,
        scheduler step, best-model tracking, prediction grids,
        checkpointing, logging. ``candidate_params`` is the post-epoch
        parameter snapshot taken before any later epoch ran, so
        deferred finalization tracks the right weights. Reference
        epoch tail: ``src/multivae/trainers/base/base_trainer.py:480-577``."""
        if np.isnan(epoch_train_loss) or np.isinf(epoch_train_loss):
            raise ArithmeticError("NaN detected in train loss")
        metrics = {"train_" + k: v for k, v in train_metrics.items()}
        metrics["train_epoch_loss"] = epoch_train_loss

        if epoch_eval_loss is not None:
            if np.isnan(epoch_eval_loss) or np.isinf(epoch_eval_loss):
                raise ArithmeticError("NaN detected in eval loss")
            metrics["eval_epoch_loss"] = epoch_eval_loss
            update_dict(metrics, {"eval_" + k: v
                                  for k, v in eval_metrics.items()})
            self._schedulers_step(epoch_eval_loss)
        else:
            epoch_eval_loss = self.best_eval_loss
            self._schedulers_step(epoch_train_loss)

        def snap():
            if candidate_params is None:  # pragma: no cover - internal
                raise RuntimeError(
                    "internal: best-model tracking fired for an epoch "
                    "whose params snapshot was skipped "
                    "(_needs_epoch_param_snapshot miscomputed)")
            return self._tree_copy(candidate_params)

        if in_graph_best is not None:
            # Fused-block mode: the params snapshot already happened
            # IN-GRAPH (the block program's (best_loss, best_params)
            # carry, materialized to _best_params at sync-finalize
            # epochs); here we only replay the device decision for the
            # reference's log lines and the best_train_loss bookkeeping.
            took, loss_f32 = in_graph_best
            if took:
                if epoch <= self.start_keep_best_epoch:
                    logger.info("New model saved!")
                elif self.training_config.keep_best_on_train:
                    self.best_train_loss = loss_f32
                    logger.info("New best model on train saved!")
                else:
                    # train+eval fused block: the device compared (and
                    # the carry holds) the EVAL loss
                    self.best_eval_loss = loss_f32
                    logger.info("New best model on eval saved!")
        elif epoch <= self.start_keep_best_epoch:
            self._best_params = snap()
            logger.info("New model saved!")
        elif (epoch_eval_loss < self.best_eval_loss
              and not self.training_config.keep_best_on_train):
            self.best_eval_loss = epoch_eval_loss
            self._best_params = snap()
            logger.info("New best model on eval saved!")
        elif (epoch_train_loss < self.best_train_loss
              and self.training_config.keep_best_on_train):
            self.best_train_loss = epoch_train_loss
            self._best_params = snap()
            logger.info("New best model on train saved!")

        if (self.training_config.steps_predict is not None
                and (epoch % self.training_config.steps_predict == 0
                     or epoch == 1)
                and self.is_main_process):
            reconstructions = self.predict(epoch)
            self.callback_handler.on_prediction_step(
                self.training_config, reconstructions=reconstructions,
                global_step=epoch,
            )
            for key, image in reconstructions.items():
                image.save(
                    os.path.join(self.training_dir, f"recon_from_{key}.png")
                )

        self.callback_handler.on_epoch_end(self.training_config)

        if (self.training_config.steps_saving is not None
                and epoch % self.training_config.steps_saving == 0):
            # ALL processes enter: the orbax sharded-state save is a
            # collective (each process writes its addressable shards
            # and joins a barrier); host-side artifacts inside are
            # main-process-gated.
            self.save_checkpoint(dir_path=self.training_dir, epoch=epoch)
            if self.is_main_process:
                logger.info("Saved checkpoint at epoch %s\n", epoch)
                if file_logger:
                    file_logger.info(f"Saved checkpoint at epoch {epoch}\n")

        self.callback_handler.on_log(
            self.training_config, metrics, logger=logger, global_step=epoch,
        )

    # ----------------------------------------------------------------- main
    def train(self, log_output_dir: Optional[str] = None):
        """Main training loop (reference ``base_trainer.py:435-577``)."""
        self.callback_handler.on_train_begin(
            self.training_config, model_config=self.model_config
        )

        msg = (
            f"Training params:\n - max_epochs: {self.training_config.num_epochs}\n"
            " - per_device_train_batch_size: "
            f"{self.training_config.per_device_train_batch_size}\n"
            " - per_device_eval_batch_size: "
            f"{self.training_config.per_device_eval_batch_size}\n"
            f" - checkpoint saving every: {self.training_config.steps_saving}\n"
            f" - data-parallel devices: {self.n_data_devices}\n"
            f"Optimizer: {self.training_config.optimizer_cls} "
            f"(lr={self.training_config.learning_rate})\n"
            f"Scheduler: {self.training_config.scheduler_cls}\n"
        )
        file_logger = None
        if self.is_main_process:
            logger.info(msg)
            if log_output_dir is not None:
                file_logger = self._get_file_logger(log_output_dir)
                file_logger.info(msg)
            logger.info("Successfully launched training !\n")

        self._sched_in_graph = False
        if self.scheduler is not None:
            # The scheduler's step count is RELATIVE to its creation (a
            # resumed run restores last_epoch; a multistage reset
            # re-seats it mid-run) — anchor the dispatch-time lr_at
            # epoch offset accordingly. 0 for any fresh BaseTrainer run.
            self._sched_epoch_base = (self.trained_epochs
                                      - self.scheduler.last_epoch)
            # Align the injected LR with the scheduler's CURRENT value on
            # entry: torch applies a schedule's initial factor at
            # construction (LinearLR trains epoch 1 at
            # base_lr*start_factor, torch.optim.lr_scheduler), and a
            # resumed scheduler re-enters at its restored LR. A no-op for
            # every schedule whose initial LR is the base LR.
            set_learning_rate(self.state.opt_state, self.scheduler.current_lr)

        # Lag-E deferred epoch finalization: every device round trip
        # through the tunnel costs ~30-45 ms of serialized queue time
        # (plan upload, scalar fetch) regardless of payload size, so the
        # loop defers up to ``pipeline_depth`` epochs' host finalization
        # and pays ONE batched scalar fetch (and one block plan upload)
        # per run of E epochs — amortizing the fixed latency to ~E-th.
        pipelined = self._pipeline_epochs_eligible()
        if ((pipelined or self._plateau_block_mode())
                and self._fused_epoch_blocks_eligible()):
            # Whole-epoch-block fusion: one launch per pipeline_depth
            # epochs (see _compiled_cached_train_block). Same logged
            # values, same final state as the per-epoch loop. A plateau
            # scheduler rides the blocks with its state carried
            # in-graph (_plateau_block_mode); it cannot take the
            # per-epoch pipelined path below, so when blocks are
            # ineligible it falls through to the synchronous loop.
            self._train_fused_epoch_blocks(file_logger)
            return self._train_tail()
        depth = max(1, self.training_config.pipeline_depth)
        pending = []
        pending_staged = True
        for epoch in range(self.trained_epochs + 1,
                           self.training_config.num_epochs + 1):
            self.callback_handler.on_epoch_begin(
                self.training_config, epoch=epoch,
                train_loader=self.train_loader, eval_loader=self.eval_loader,
            )
            self.best_train_loss, self.best_eval_loss = self.prepare_train_step(
                epoch, self.best_train_loss, self.best_eval_loss
            )

            if not pipelined:
                # The synchronous loop goes through the PUBLIC
                # train_step/eval_step hooks so subclass overrides run.
                epoch_train_loss, epoch_metrics = self.train_step(epoch)
                epoch_eval_loss = epoch_eval_metrics = None
                if self.eval_dataset is not None:
                    epoch_eval_loss, epoch_eval_metrics = self.eval_step(
                        epoch)
                self._finalize_epoch_host(
                    epoch, epoch_train_loss, epoch_metrics,
                    epoch_eval_loss, epoch_eval_metrics,
                    self.model.params, file_logger=file_logger)
                continue

            if self.scheduler is not None:
                # Deterministic schedule under pipelining: set epoch
                # ``epoch``'s LR at dispatch time (``lr_at`` reproduces
                # the stateful ``step()`` value exactly — same f64 host
                # arithmetic, cast f32 once here); the deferred
                # finalize's replayed ``scheduler.step()`` then writes
                # the SAME values, keeping checkpointed opt_state
                # bit-identical to the synchronous path's. The epoch
                # base anchors a scheduler re-seated mid-run
                # (multistage reset).
                set_learning_rate(self.state.opt_state,
                                  self.scheduler.lr_at(
                                      epoch - 1 - self._sched_epoch_base))

            # Skip the per-epoch params-snapshot launch when nothing can
            # consume it (no best-model tracking, no update hook); the
            # last epoch and sync-finalize epochs still refresh so
            # predict/checkpoint/final-save read fresh params.
            refresh = (self._needs_epoch_param_snapshot
                       or self._epoch_needs_sync_finalize(epoch)
                       or epoch == self.training_config.num_epochs)
            train_sums = self._train_epoch_device(epoch,
                                                  refresh_params=refresh)
            eval_sums = (self._eval_epoch_device(epoch)
                         if self.eval_dataset is not None else None)
            # Post-epoch parameter snapshot (a fresh copy made by the
            # epoch tail) — finalization may run epochs later, after
            # the TrainState has moved on.
            candidate = self.model.params if refresh else None

            # Stage the deferred scalar vectors' device->host copies now
            # (same rationale as _run_cached_train_epoch_block: a
            # transfer requested at flush time can serialize behind the
            # epochs dispatched in the meantime). Only if EVERY vector
            # stages does the flush read them individually; otherwise it
            # keeps the one-transfer concat.
            for sums in (train_sums, eval_sums):
                vec = sums[0] if isinstance(sums, tuple) else None
                if vec is None:
                    continue
                try:
                    vec.copy_to_host_async()
                except Exception:  # pragma: no cover - optional hint
                    pending_staged = False
            pending.append((epoch, train_sums, eval_sums, candidate))
            if (epoch == self.training_config.num_epochs
                    or self._epoch_needs_sync_finalize(epoch)
                    or len(pending) >= depth):
                self._finalize_epochs(pending, file_logger=file_logger,
                                      staged=pending_staged)
                pending = []
                pending_staged = True

        if pending:
            self._finalize_epochs(pending, file_logger=file_logger,
                                  staged=pending_staged)
        self._train_tail()

    def _train_tail(self):
        """Shared end of ``train()``: final-model save, checkpoint
        barrier, end callbacks."""
        final_dir = os.path.join(self.training_dir, "final_model")
        if self.is_main_process:
            self.save_model(dir_path=final_dir)
            logger.info("Training ended!")
            logger.info("Saved final model in %s", final_dir)
        # Any in-flight async checkpoint save must be on disk before
        # train() returns to the user.
        self.wait_for_checkpoint()
        self.callback_handler.on_train_end(self.training_config)

    @property
    def best_params(self):
        return (self._best_params if self._best_params is not None
                else self.model.params)

    @property
    def best_model(self):
        """The model carrying the best-eval params (reference keeps a
        deepcopied ``_best_model``; here params are snapshots, so the live
        model is rebound to the best snapshot)."""
        self.model.params = self.best_params
        return self.model

    # ------------------------------------------------------------ save/load
    def _with_params(self, params):
        """Context: temporarily swap model params."""
        model = self.model

        class _Swap:
            def __enter__(self_inner):
                self_inner.saved = model.params
                model.params = params

            def __exit__(self_inner, *a):
                model.params = self_inner.saved

        return _Swap()

    def save_model(self, dir_path: str, params=None):
        """Save the best model + training config (reference ``:704-726``)."""
        os.makedirs(dir_path, exist_ok=True)
        with self._with_params(params if params is not None else self.best_params):
            self.model.save(dir_path)
        self.training_config.save_json(dir_path, "training_config")
        self.callback_handler.on_save(self.training_config, dir_path=dir_path)

    # ------------------------------------------------- orbax (sharded) state
    @staticmethod
    def _state_to_savable(state: TrainState) -> dict:
        """TrainState as an orbax-friendly pytree (typed PRNG keys become
        their uint32 key data; orbax does not serialize extended dtypes)."""
        return {
            "params": state.params,
            "opt_state": state.opt_state,
            "rng_data": jax.random.key_data(state.rng),
            "step": state.step,
        }

    _orbax_ckptr = None

    def _orbax_checkpointer(self):
        """Persistent checkpointer: orbax's ``StandardCheckpointer`` IS an
        ``AsyncCheckpointer`` — ``save()`` returns once the device->host
        copy is done and commits serialization + disk writes on a
        background thread; keeping ONE instance alive lets consecutive
        epochs' saves overlap training."""
        if BaseTrainer._orbax_ckptr is None:
            import orbax.checkpoint as ocp

            BaseTrainer._orbax_ckptr = ocp.StandardCheckpointer()
        return BaseTrainer._orbax_ckptr

    def wait_for_checkpoint(self):
        """Block until any in-flight async checkpoint save is committed
        to disk. Called automatically before the next save, before an
        orbax restore, and at the end of ``train()``."""
        if BaseTrainer._orbax_ckptr is not None:
            BaseTrainer._orbax_ckptr.wait_until_finished()

    def _orbax_save_state(self, checkpoint_dir: str):
        """Sharded TrainState save: every host writes its own shards (no
        host gather — the multi-host/fsdp-scale path the reference's
        torch.save checkpointing has no equivalent for).

        With ``async_checkpointing=True`` (default) only the
        device->host copy blocks the loop — safe against the train
        step's buffer donation, since the next step's writes land after
        the copy — and the disk commit proceeds in the background,
        barriered at the next save / restore / end of ``train()``."""
        ckptr = self._orbax_checkpointer()
        ckptr.wait_until_finished()  # previous epoch's in-flight save
        ckptr.save(
            os.path.abspath(os.path.join(checkpoint_dir, "train_state")),
            self._state_to_savable(self.state),
        )
        if not getattr(self.training_config, "async_checkpointing", True):
            ckptr.wait_until_finished()

    def _orbax_restore_state(self, checkpoint_dir: str):
        """Restore the TrainState directly into the trainer's target
        shardings (replicated, or the ZeRO specs when fsdp): each device
        reads its own shards, no host-side round-trip.

        The restore targets come from the CURRENT trainer's mesh, not the
        saving trainer's, so a checkpoint saved on one topology (8-device
        fsdp) restores cleanly into another (4-device, replicated,
        single-device) — each device just reads the slices it now owns.

        Single-device / single-process: restore WITHOUT sharding targets
        and re-transfer leaves uncommitted. NamedSharding targets produce
        COMMITTED arrays, which fall off the axon TPU plugin's fast
        execution path (measured 53 vs 4,184 steps/s on the same jitted
        step; see ``utils/host_init.py``)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(checkpoint_dir, "train_state"))
        savable = self._state_to_savable(self.state)
        # An in-flight async save of THIS trainer (restart-in-process
        # tests do save -> new trainer -> restore) must commit first.
        self.wait_for_checkpoint()
        single = self.mesh.size == 1 and jax.process_count() == 1
        if single:
            # explicit local-device sharding: without it orbax populates
            # shardings from the checkpoint FILE, which may reference a
            # different topology/backend than this process has
            dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            abstract = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                               sharding=dev),
                savable,
            )
        else:
            rep = replicated_sharding(self.mesh)
            state_sh = self._state_sharding(rep)
            if isinstance(state_sh, TrainState):
                sharding_tree = {
                    "params": state_sh.params,
                    "opt_state": state_sh.opt_state,
                    "rng_data": rep,
                    "step": rep,
                }
            else:  # one sharding for the whole state (replicated)
                sharding_tree = jax.tree.map(lambda _: state_sh, savable)
            abstract = jax.tree.map(
                lambda a, sh: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                                   sharding=sh),
                savable, sharding_tree,
            )
        ckptr = self._orbax_checkpointer()
        restored = ckptr.restore(path, abstract)
        if single:
            # uncommitted re-transfer, exactly as host_init does
            restored = jax.tree.map(
                lambda x: jnp.asarray(np.asarray(x)), restored
            )
        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            rng=jax.random.wrap_key_data(restored["rng_data"]),
            step=restored["step"],
        )

    def save_checkpoint(self, dir_path: str, epoch: int):
        """Checkpoint = best model + optimizer/scheduler + loop counters.

        Reference layout ``base_trainer.py:728-775``. With
        ``checkpoint_backend="orbax"`` the full TrainState (params +
        optimizer moments + rng + step) is additionally saved sharded.
        """
        checkpoint_dir = os.path.join(dir_path, f"checkpoint_epoch_{epoch}")
        os.makedirs(checkpoint_dir, exist_ok=True)

        if self.training_config.checkpoint_backend == "orbax":
            # collective: EVERY process participates (writes its
            # addressable shards and joins orbax's barrier)
            self._orbax_save_state(checkpoint_dir)
        elif self.is_main_process:
            opt_state_dict = serialization.to_state_dict(
                jax.tree.map(np.asarray, self.state.opt_state)
            )
            with open(os.path.join(checkpoint_dir, "optimizer.msgpack"),
                      "wb") as f:
                f.write(serialization.msgpack_serialize(opt_state_dict))
            # The model files in the checkpoint hold the BEST snapshot
            # (reference contract ``base_trainer.py:550-553``: checkpoints
            # save ``self._best_model``), which is NOT the state training
            # continues from whenever the loss is non-monotonic. Save the
            # LIVE params alongside so resume reproduces the uninterrupted
            # run exactly — the reference restarts from the best snapshot
            # (``base_trainer.py:110-111``) and silently diverges there.
            live = serialization.to_state_dict(
                jax.tree.map(np.asarray, self.state.params)
            )
            with open(os.path.join(checkpoint_dir, "live_params.msgpack"),
                      "wb") as f:
                f.write(serialization.msgpack_serialize(live))

        if not self.is_main_process:
            return  # remaining artifacts are host-side, main process only

        if self.scheduler is not None:
            with open(os.path.join(checkpoint_dir, "scheduler.json"), "w") as f:
                json.dump(self.scheduler.state_dict(), f)

        with self._with_params(self.best_params):
            self.model.save(checkpoint_dir)
        self.training_config.save_json(checkpoint_dir, "training_config")

        info = dict(
            training_dir=self.training_dir,
            trained_epochs=epoch,
            best_train_loss=self.best_train_loss,
            best_eval_loss=self.best_eval_loss,
        )
        with open(os.path.join(checkpoint_dir, "info_checkpoint.json"), "w") as fp:
            json.dump(info, fp, sort_keys=True, indent=4)

        self.callback_handler.on_save_checkpoint(
            self.training_config, checkpoint_dir=checkpoint_dir
        )

    def _resume_from_checkpoint(self, checkpoint_dir: str):
        """Reload model weights, optimizer/scheduler state and counters.

        Reference ``base_trainer.py:390-427``.
        """
        with open(os.path.join(checkpoint_dir, "info_checkpoint.json")) as fp:
            info = json.load(fp)
        self.trained_epochs = info["trained_epochs"]
        self.best_train_loss = info["best_train_loss"]
        self.best_eval_loss = info["best_eval_loss"]

        if os.path.isdir(os.path.join(checkpoint_dir, "train_state")):
            # orbax backend: restore the exact (possibly sharded) live
            # TrainState; the best-model snapshot stays in the msgpack
            # model files alongside.
            self.state = self._orbax_restore_state(checkpoint_dir)
            # copy: the TrainState is donated every step — aliasing
            # model.params to it would leave the model holding deleted
            # buffers after the first resumed step
            self.model.params = self._tree_copy(self.state.params)
            best = type(self.model)._load_params(checkpoint_dir)
            self._best_params = jax.tree.map(jnp.asarray, best)
            sch_path = os.path.join(checkpoint_dir, "scheduler.json")
            if self.scheduler is not None and os.path.exists(sch_path):
                with open(sch_path) as f:
                    self.scheduler.load_state_dict(json.load(f))
            return

        params = type(self.model)._load_params(checkpoint_dir)
        params = jax.tree.map(jnp.asarray, params)
        self.model.params = params
        self._best_params = params
        live_path = os.path.join(checkpoint_dir, "live_params.msgpack")
        if os.path.exists(live_path):
            # Exact resume: the model files hold the best snapshot; the
            # LIVE params training left off at ride in a sibling file
            # (see save_checkpoint). Older checkpoints without it fall
            # back to the reference's restart-from-best semantics.
            with open(live_path, "rb") as f:
                restored = serialization.msgpack_restore(f.read())
            live = serialization.from_state_dict(params, restored)
            params = jax.tree.map(jnp.asarray, live)
            self.model.params = params
        # the TrainState below is donated every step: it must NOT share
        # buffers with model.params/_best_params (the first resumed step
        # would delete them — surfaced by the multistage resume test
        # when no later epoch improved on the restored best)
        params = self._tree_copy(params)

        opt_path = os.path.join(checkpoint_dir, "optimizer.msgpack")
        opt_state = self.optimizer.init(params)
        if os.path.exists(opt_path):
            with open(opt_path, "rb") as f:
                restored = serialization.msgpack_restore(f.read())
            opt_state = serialization.from_state_dict(opt_state, restored)

        sch_path = os.path.join(checkpoint_dir, "scheduler.json")
        if self.scheduler is not None and os.path.exists(sch_path):
            with open(sch_path) as f:
                self.scheduler.load_state_dict(json.load(f))

        self.state = TrainState(
            params=params, opt_state=opt_state,
            rng=jax.random.key(self.training_config.seed),
            step=jnp.asarray(self.trained_epochs * len(self.train_loader),
                             jnp.int32),
        )

    # ----------------------------------------------------------- prediction
    def predict(self, epoch: int = 0, n_data: int = 8):
        """Self/cross/joint reconstruction grids as PIL images.

        Reference ``base_trainer.py:777-885``.
        """
        predict_dataset = (
            self.eval_dataset if self.eval_dataset is not None
            else self.train_dataset
        )
        raw = predict_dataset.get_batch(np.arange(min(n_data, len(predict_dataset))))
        inputs_data = raw["data"]
        from ...data.batch import batch_from_arrays

        batch = batch_from_arrays(data=inputs_data)

        all_recons = {}
        model = self.model
        if not isinstance(model, BaseMultiVAE):
            # CVAE-style models: joint reconstruction of the main modality
            # (reference ``base_trainer.py:829-885`` runs the joint block
            # for CVAE too)
            if hasattr(model, "main_modality"):
                with self._with_params(self.best_params):
                    recon = model.predict(batch, cond_mod="all", N=8,
                                          flatten=True)
                grids = {
                    model.main_modality:
                        predict_dataset.transform_for_plotting(
                            np.asarray(recon[model.main_modality]),
                            model.main_modality),
                    "true_data": predict_dataset.transform_for_plotting(
                        np.asarray(inputs_data[model.main_modality]),
                        model.main_modality),
                }
                grids, _ = adapt_shape(grids)
                grid = make_grid(
                    np.concatenate([grids["true_data"],
                                    grids[model.main_modality]], 0),
                    nrow=n_data,
                )
                all_recons["all"] = grid_to_pil(grid)
            return all_recons

        with self._with_params(self.best_params):
            for mod in inputs_data:
                recon = model.predict(batch, mod, "all", N=8, flatten=True,
                                      ignore_incomplete=True)
                recon = {
                    m: predict_dataset.transform_for_plotting(
                        np.asarray(recon[m]), modality=m)
                    for m in recon
                }
                recon["true_data"] = predict_dataset.transform_for_plotting(
                    np.asarray(inputs_data[mod]), modality=mod
                )
                recon, _ = adapt_shape(recon)
                rows = [recon["true_data"]] + [
                    recon[m] for m in recon if m != "true_data"
                ]
                grid = make_grid(np.concatenate(rows, 0), nrow=n_data)
                all_recons[mod] = grid_to_pil(grid)

            # joint reconstruction conditioned on all modalities
            recon = model.predict(batch, "all", "all", N=8, flatten=True,
                                  ignore_incomplete=True)
            gen_mods = list(recon.keys())
            recon = {
                m: predict_dataset.transform_for_plotting(
                    np.asarray(recon[m]), modality=m)
                for m in recon
            }
            for m in inputs_data:
                recon[f"true_data_{m}"] = predict_dataset.transform_for_plotting(
                    np.asarray(inputs_data[m]), modality=m
                )
            recon, _ = adapt_shape(recon)
            rows = [recon[f"true_data_{m}"] for m in inputs_data] + [
                recon[m] for m in gen_mods
            ]
            grid = make_grid(np.concatenate(rows, 0), nrow=n_data)
            all_recons["all"] = grid_to_pil(grid)

        return all_recons

    # -------------------------------------------------------------- logging
    def _get_file_logger(self, log_output_dir: str):
        os.makedirs(log_output_dir, exist_ok=True)
        log_name = f"training_logs_{os.path.basename(self.training_dir)}"
        file_logger = logging.getLogger(log_name)
        file_logger.setLevel(logging.INFO)
        handler = logging.FileHandler(
            os.path.join(log_output_dir, f"{log_name}.log")
        )
        file_logger.addHandler(handler)
        return file_logger
