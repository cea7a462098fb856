"""Evaluator base class (reference
``src/multivae/metrics/base/evaluator_class.py``): batching, file logger,
optional wandb resume, sampler hookup."""

from __future__ import annotations

import datetime
import logging
import os
from pathlib import Path

from ...data.loader import DataLoader


class Evaluator:
    """Base class for metric modules.

    Args:
        model: the model to evaluate.
        test_dataset: dataset for computing the metrics.
        output: folder to save a ``metrics.log`` file (optional).
        eval_config: EvaluatorConfig.
        sampler: optional fitted latent sampler for joint generation.
    """

    def __init__(self, model, test_dataset, output: str = None,
                 eval_config=None, sampler=None):
        from .evaluator_config import EvaluatorConfig

        if eval_config is None:
            eval_config = EvaluatorConfig()
        self.model = model
        self.n_data = len(test_dataset)
        self.batch_size = min(eval_config.batch_size, self.n_data)
        self.test_dataset = test_dataset
        self.eval_config = eval_config
        self.n_devices = int(getattr(eval_config, "n_devices", 1) or 1)
        self.mesh = None
        if self.n_devices > 1:
            # TPU-native extension: shard eval batches over a 1-D data
            # mesh; XLA partitions the model's jitted eval programs from
            # the input shardings (weights are zero on padding rows, so
            # the weighted metric kernels are sharding-invariant).
            from ...parallel.mesh import get_data_mesh

            rem = self.batch_size % self.n_devices
            if rem:
                self.batch_size += self.n_devices - rem
            self.mesh = get_data_mesh(self.n_devices)
        self.test_loader = DataLoader(test_dataset, self.batch_size,
                                      shuffle=False, drop_last=False)
        cached = False
        if getattr(eval_config, "cache_on_device", False):
            # HBM-resident test set: evaluator sweeps re-read the test
            # set many times; gathering on device replaces a
            # multi-megabyte upload per batch with one tiny dispatch.
            # Composes with sharded evaluation: on a data mesh the cache
            # follows the trainer's layout rules (replicated, or
            # row-sharded when only that fits the per-device budget) and
            # the gathered batch is constrained onto the data axis.
            # Falls back silently (with a logged reason) when unsafe.
            from ...data.device_cache import (
                DeviceCachedLoader,
                build_device_cache,
            )
            from ...parallel.mesh import get_data_mesh

            budget = int(getattr(eval_config, "device_cache_budget_gb",
                                 8.0) * 1e9)
            mesh = self.mesh if self.mesh is not None else get_data_mesh(1)
            import jax

            multihost = any(d.process_index != jax.process_index()
                            for d in mesh.devices.flat)
            # evaluator sweeps are per-process host loops (only the
            # TRAINER's cached programs consume global multi-host plans)
            cache = (None if multihost
                     else build_device_cache(test_dataset, mesh, budget))
            if cache is not None:
                self.test_loader = DeviceCachedLoader(self.test_loader,
                                                      cache, mesh=mesh)
                cached = True
        if self.mesh is not None and not cached:
            from ...data.prefetch import PrefetchLoader

            self.test_loader = PrefetchLoader(self.test_loader, self.mesh,
                                              depth=2)
        if output is not None:
            Path(output).mkdir(parents=True, exist_ok=True)
        self.output = output
        self.set_logger(output)
        self.set_wandb(eval_config.wandb_path)
        self.metrics = {}
        self.sampler = sampler
        if self.sampler is not None and not sampler.is_fitted:
            raise AttributeError(
                "The provided sampler is not fitted. Please fit the sampler "
                "before using it in the evaluator module."
            )

    def set_logger(self, output):
        evaluator_id = (
            str(datetime.datetime.now())[0:19].replace(" ", "_").replace(
                ":", "-")
        )
        logger = logging.getLogger(evaluator_id)
        logger.setLevel(logging.INFO)
        self.console_handler = logging.StreamHandler()
        logger.addHandler(self.console_handler)
        if output is not None:
            self.file_handler = logging.FileHandler(
                os.path.join(str(output), "metrics.log")
            )
            logger.addHandler(self.file_handler)
        self.logger = logger

    def set_wandb(self, wandb_path):
        if wandb_path is None:
            self.wandb_run = None
            return
        try:
            import wandb
        except ImportError as e:
            raise ModuleNotFoundError(
                "You provided a wandb_path, but the `wandb` package is not "
                "installed. Run `pip install wandb`."
            ) from e
        entity, project, run_id = tuple(wandb_path.split("/"))
        self.wandb_run = wandb.init(entity=entity, project=project,
                                    id=run_id, resume="allow", reinit=True)

    def log_to_wandb(self):  # pragma: no cover
        if self.wandb_run is not None:
            self.wandb_run.log(self.metrics)

    def finish(self):
        """Remove handlers and finish the wandb run."""
        self.logger.removeHandler(self.console_handler)
        if hasattr(self, "file_handler"):
            self.logger.removeHandler(self.file_handler)
        if self.wandb_run is not None:
            self.wandb_run.finish()
