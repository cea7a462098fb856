"""Training callbacks (event bus + built-ins).

Re-implementation of reference ``src/multivae/trainers/base/callbacks.py``:
``TrainingCallback`` event interface, ``CallbackHandler`` fan-out,
progress-bar and console-metric built-ins, and an optional wandb callback
(gated on the package being installed).
"""

from __future__ import annotations

import importlib
import json
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def wandb_is_available() -> bool:
    return importlib.util.find_spec("wandb") is not None


def load_wandb_path_from_folder(path: str) -> str:
    with open(os.path.join(path, "wandb_info.json")) as fp:
        return json.load(fp)["path"]


def rename_logs(logs: dict) -> dict:
    """train_metric -> train/metric (reference ``callbacks.py:34-50``)."""
    clean = {}
    for name, v in logs.items():
        if name.startswith("train_"):
            clean[name.replace("train_", "train/", 1)] = v
        if name.startswith("eval_"):
            clean[name.replace("eval_", "eval/", 1)] = v
    return clean


class TrainingCallback:
    """Base class for training callbacks (reference ``callbacks.py:53-96``)."""

    def on_init_end(self, training_config, **kwargs):
        pass

    def on_train_begin(self, training_config, **kwargs):
        pass

    def on_train_end(self, training_config, **kwargs):
        pass

    def on_epoch_begin(self, training_config, **kwargs):
        pass

    def on_epoch_end(self, training_config, **kwargs):
        pass

    def on_train_step_begin(self, training_config, **kwargs):
        pass

    def on_train_step_end(self, training_config, **kwargs):
        pass

    def on_eval_step_begin(self, training_config, **kwargs):
        pass

    def on_eval_step_end(self, training_config, **kwargs):
        pass

    def on_evaluate(self, training_config, **kwargs):
        pass

    def on_prediction_step(self, training_config, **kwargs):
        pass

    def on_save(self, training_config, **kwargs):
        pass

    def on_save_checkpoint(self, training_config, **kwargs):
        pass

    def on_log(self, training_config, logs, **kwargs):
        pass


class CallbackHandler:
    """Dispatches events to a list of callbacks (reference ``:99-170``)."""

    def __init__(self, callbacks, model):
        self.callbacks = []
        for cb in callbacks:
            self.add_callback(cb)
        self.model = model

    def add_callback(self, callback):
        cb = callback() if isinstance(callback, type) else callback
        cb_class = callback if isinstance(callback, type) else callback.__class__
        if cb_class in [c.__class__ for c in self.callbacks]:
            logger.warning(
                "You are adding a %s to the callbacks but one is already used. "
                "The current list of callbacks is:\n%s",
                cb_class, self.callback_list,
            )
        self.callbacks.append(cb)

    @property
    def callback_list(self):
        return "\n".join(cb.__class__.__name__ for cb in self.callbacks)

    def call_event(self, event, training_config, **kwargs):
        for callback in self.callbacks:
            getattr(callback, event)(training_config, model=self.model, **kwargs)

    def __getattr__(self, name):
        if name.startswith("on_"):
            def dispatch(training_config, *args, **kwargs):
                if name == "on_log" and args:
                    kwargs["logs"] = args[0]
                    args = args[1:]
                self.call_event(name, training_config, **kwargs)

            return dispatch
        raise AttributeError(name)


class MetricConsolePrinterCallback(TrainingCallback):
    """Prints epoch train/eval losses to the console."""

    def __init__(self):
        self.logger = logging.getLogger(__name__)
        self.logger.setLevel(logging.INFO)

    def on_log(self, training_config, logs, **kwargs):
        log = kwargs.pop("logger", self.logger)
        if log is None:
            return
        train_loss = logs.get("train_epoch_loss", None)
        eval_loss = logs.get("eval_epoch_loss", None)
        log.info("-" * 74)
        if train_loss is not None:
            log.info("Train loss: %s", np.round(train_loss, 4))
        if eval_loss is not None:
            log.info("Eval loss: %s", np.round(eval_loss, 4))
        log.info("-" * 74)


class ProgressBarCallback(TrainingCallback):
    """tqdm progress bars for train/eval steps (reference ``:204-248``)."""

    def __init__(self):
        self.train_progress_bar = None
        self.eval_progress_bar = None

    def on_train_step_begin(self, training_config, **kwargs):
        from tqdm.auto import tqdm

        epoch = kwargs.pop("epoch", None)
        train_loader = kwargs.pop("train_loader", None)
        if train_loader is not None:
            self.train_progress_bar = tqdm(
                total=len(train_loader), unit="batch",
                desc=f"Training of epoch {epoch}/{training_config.num_epochs}",
            )

    def on_eval_step_begin(self, training_config, **kwargs):
        from tqdm.auto import tqdm

        epoch = kwargs.pop("epoch", None)
        eval_loader = kwargs.pop("eval_loader", None)
        if eval_loader is not None:
            self.eval_progress_bar = tqdm(
                total=len(eval_loader), unit="batch",
                desc=f"Eval of epoch {epoch}/{training_config.num_epochs}",
            )

    def on_train_step_end(self, training_config, **kwargs):
        if self.train_progress_bar is not None:
            self.train_progress_bar.update(1)

    def on_eval_step_end(self, training_config, **kwargs):
        if self.eval_progress_bar is not None:
            self.eval_progress_bar.update(1)

    def on_epoch_end(self, training_config, **kwargs):
        if self.train_progress_bar is not None:
            self.train_progress_bar.close()
        if self.eval_progress_bar is not None:
            self.eval_progress_bar.close()


class StepTimingCallback(TrainingCallback):
    """Wall-clock instrumentation: epoch time + steps/s.

    New capability vs the reference (SURVEY §5.1: the reference has no
    profiling hooks). The timings are injected into the logged metrics.

    Note: under ``pipeline_epochs``/fused epoch blocks the step hooks
    fire around DISPATCH, which runs ahead of the device — per-epoch
    times then measure dispatch, not device work. For exact attribution
    use ``JaxProfilerCallback`` (its custom ``on_epoch_end`` auto-
    disables pipelining) or set ``pipeline_epochs=False``.
    """

    def __init__(self):
        import time

        self._time = time.perf_counter
        self._epoch_start = None
        self._steps = 0
        self.history = []

    def on_epoch_begin(self, training_config, **kwargs):
        self._epoch_start = self._time()
        self._steps = 0

    def on_train_step_end(self, training_config, **kwargs):
        self._steps += 1

    def on_log(self, training_config, logs, **kwargs):
        if self._epoch_start is None:
            return
        elapsed = self._time() - self._epoch_start
        logs["epoch_time_s"] = elapsed
        if self._steps:
            logs["train_steps_per_s"] = self._steps / elapsed
        self.history.append(
            {"epoch_time_s": elapsed, "steps": self._steps}
        )


class JaxProfilerCallback(TrainingCallback):
    """Capture a jax.profiler trace for selected epochs.

    The trace (viewable in TensorBoard / Perfetto) covers the full epoch:
    compiled step execution, host gaps, transfers. New capability vs the
    reference (SURVEY §5.1).
    """

    def __init__(self, trace_dir: str, epochs=(2,)):
        self.trace_dir = trace_dir
        self.epochs = set(epochs)
        self._active = False

    def on_epoch_begin(self, training_config, **kwargs):
        import jax

        epoch = kwargs.get("epoch")
        if epoch in self.epochs and not self._active:
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True

    def on_epoch_end(self, training_config, **kwargs):
        import jax

        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class WandbCallback(TrainingCallback):
    """Weights & Biases logging (reference ``callbacks.py:251-387``).

    Requires the optional wandb package; call ``setup`` before training.
    """

    def __init__(self):
        if not wandb_is_available():
            raise ModuleNotFoundError(
                "`wandb` package must be installed. Run `pip install wandb`"
            )
        import wandb

        self._wandb = wandb
        self.is_initialized = False

    def setup(self, training_config, model_config=None, project_name="multivae_tpu",
              entity_name=None, run_id=None, **kwargs):
        self.is_initialized = True
        if run_id is not None:
            self.run = self._wandb.init(
                project=project_name, entity=entity_name, id=run_id,
                resume="must",
            )
        else:
            self.run = self._wandb.init(project=project_name, entity=entity_name)
        training_config_dict = training_config.to_dict()
        self.run.config.update({"training_config": training_config_dict})
        if model_config is not None:
            self.run.config.update({"model_config": model_config.to_dict()})

    def on_train_begin(self, training_config, **kwargs):
        model_config = kwargs.pop("model_config", None)
        if not self.is_initialized:
            self.setup(training_config, model_config=model_config)

    def on_log(self, training_config, logs, **kwargs):
        global_step = kwargs.pop("global_step", None)
        logs = rename_logs(logs)
        self._wandb.log({**logs, "train/global_step": global_step})

    def on_prediction_step(self, training_config, **kwargs):
        global_step = kwargs.pop("global_step", None)
        reconstructions = kwargs.pop("reconstructions", None)
        if reconstructions is not None:
            images = {
                f"recon_from_{k}": self._wandb.Image(v)
                for k, v in reconstructions.items()
            }
            self._wandb.log({**images, "train/global_step": global_step})

    def on_save_checkpoint(self, training_config, **kwargs):
        checkpoint_dir = kwargs.pop("checkpoint_dir", None)
        if checkpoint_dir is not None:
            info = {"path": f"{self.run.entity}/{self.run.project}/{self.run.id}"}
            with open(os.path.join(checkpoint_dir, "wandb_info.json"), "w") as fp:
                json.dump(info, fp)

    def on_train_end(self, training_config, **kwargs):
        self.run.finish()
