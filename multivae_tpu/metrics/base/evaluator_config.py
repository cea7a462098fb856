"""Evaluator base config (reference
``src/multivae/metrics/base/evaluator_config.py``)."""

from __future__ import annotations

from typing import Optional

from pydantic.dataclasses import dataclass

from ...utils.config import BaseConfig


@dataclass
class EvaluatorConfig(BaseConfig):
    """Base config for evaluation modules.

    Args:
        batch_size: evaluation batch size.
        wandb_path: 'entity/project/run_id' to resume logging into an
            existing wandb run (requires the optional wandb package).
        n_devices: shard evaluation batches over a 1-D data mesh of this
            many devices (TPU-native extension; the reference evaluates on
            one device). The model's jitted eval programs are partitioned
            by XLA from the input shardings; batch_size is rounded up to a
            multiple of n_devices (padding rows carry zero weight).
        cache_on_device: keep the test set resident in HBM and gather
            each evaluation batch on device (one tiny dispatch instead of
            a multi-megabyte host upload per batch — evaluator sweeps
            re-read the test set many times). Batches are bit-identical
            to the host loader's. Automatic fallback when the dataset
            exceeds ``device_cache_budget_gb``, under multi-device/
            multi-host evaluation, or when the dataset doesn't support
            bulk indexing. TPU-native extension, on by default.
        device_cache_budget_gb: HBM budget for the test-set cache.
    """

    batch_size: int = 512
    wandb_path: Optional[str] = None
    n_devices: int = 1
    cache_on_device: bool = True
    device_cache_budget_gb: float = 8.0
