"""MultistageTrainer: optimizer resets at stage boundaries.

Reference: ``src/multivae/trainers/multistage/multistage_trainer.py``. At
each epoch in ``model.reset_optimizer_epochs``: checkpoint the best model,
restore its weights into the live model, reset the optimizer/scheduler and
the best-loss trackers. Additionally (TPU-specific), models that change
their compiled objective across stages expose ``stage_for_epoch``/
``set_stage``; when the stage flips, the compiled train/eval programs are
rebuilt (static-branch staging instead of torch's dynamic ``epoch <=
warmup`` checks inside forward).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from ..base.base_trainer import BaseTrainer, TrainState
from ..base.optim import make_optimizer, make_scheduler, set_learning_rate

logger = logging.getLogger(__name__)
logger.setLevel(logging.INFO)


class MultistageTrainer(BaseTrainer):
    """Trainer for two-stage models (TELBO, JNF)."""

    def checktrainer(self, model):
        return

    def _prepare_boundaries(self):
        """The epochs where ``prepare_train_step`` does real work are
        STATIC (the model's ``reset_optimizer_epochs`` list and the
        ``stage_for_epoch`` flip points), so two-stage training rides
        the pipelined / fused-block fast paths WITHIN each stage: the
        base trainer breaks epoch blocks at these boundaries, forces a
        synchronous finalize of the preceding epoch (the reset reads
        ``best_params`` and checkpoints epoch-1), and rebuilds the
        in-graph best carry after a reset. Stage flips only invalidate
        compiled programs (one extra whole-model compile per stage —
        the same count the synchronous loop pays for its chunk
        programs)."""
        model = self.model
        bounds = set(getattr(model, "reset_optimizer_epochs", []) or [])
        if hasattr(model, "stage_for_epoch"):
            for e in range(2, self.training_config.num_epochs + 1):
                if model.stage_for_epoch(e) != model.stage_for_epoch(e - 1):
                    bounds.add(e)
        return bounds

    def _invalidate_compiled(self):
        self._train_step_fn = None
        self._eval_step_fn = None
        self._cached_train_fns = {}
        self._cached_eval_fns = {}

    def prepare_train_step(self, epoch, best_train_loss, best_eval_loss):
        """Reference ``prepare_train_step``
        (``multistage_trainer.py:53-71``)."""
        model = self.model
        stage_changed = False
        if hasattr(model, "stage_for_epoch"):
            stage_changed = model.set_stage(model.stage_for_epoch(epoch))

        if epoch in getattr(model, "reset_optimizer_epochs", []):
            logger.info("Epoch %s : reset the optimizer and losses.", epoch)
            logger.info(
                "Keeping the best model obtained until here for the rest of "
                "training."
            )
            # NOT main-process-gated: with checkpoint_backend="orbax" the
            # sharded TrainState save is a COLLECTIVE (every process must
            # enter); host-side artifacts are gated inside save_checkpoint.
            self.save_checkpoint(dir_path=self.training_dir,
                                 epoch=epoch - 1)
            params = self._tree_copy(self.best_params)
            model.params = params
            # separate buffers for the donated TrainState (donation would
            # otherwise delete model.params at the first post-reset step)
            params = self._tree_copy(params)
            self.optimizer = make_optimizer(
                self.training_config.optimizer_cls,
                self.training_config.learning_rate,
                self.training_config.optimizer_params,
            )
            self.scheduler = make_scheduler(
                self.training_config.scheduler_cls,
                self.training_config.learning_rate,
                self.training_config.scheduler_params,
            )
            # the fresh scheduler's step count restarts here: anchor the
            # dispatch-time lr_at offset (pipelined/fused paths) and
            # reset the injected LR the way the fresh opt_state does
            self._sched_epoch_base = epoch - 1
            self.state = TrainState(
                params=params,
                opt_state=self.optimizer.init(params),
                rng=self.state.rng,
                step=self.state.step,
            )
            if self.scheduler is not None:
                # torch applies a schedule's initial factor at scheduler
                # CONSTRUCTION (LinearLR/ConstantLR start below base_lr)
                # — align the fresh opt_state's injected LR the same way
                # train() does on entry, so the synchronous loop and the
                # dispatch-time lr_at paths train the first post-reset
                # epoch under the same LR.
                set_learning_rate(self.state.opt_state,
                                  self.scheduler.current_lr)
            self._best_params = None
            best_train_loss = 1e12
            best_eval_loss = 1e12
            stage_changed = True

        if stage_changed:
            self._invalidate_compiled()
        return best_train_loss, best_eval_loss
