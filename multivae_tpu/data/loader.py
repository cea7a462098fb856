"""Static-shape batching with padding + sample weights, and device put.

Replaces the reference's torch ``DataLoader`` + ``DistributedSampler``
(``src/multivae/trainers/base/base_trainer.py:196-222``). TPU-first design:

- every batch has the *same static shape* (the last partial batch is padded
  by wrapping around, with ``weights`` zeroed on pads) so the jitted train
  step never retraces;
- per-host sharding for multi-host data parallelism: each process iterates
  only over its slice of the epoch permutation;
- masks are always materialized (all-ones for complete datasets) so one
  compiled program serves both complete and incomplete data.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np

from .batch import MultimodalBatch, batch_from_arrays
from .datasets.base import MultimodalBaseDataset


class DataLoader:
    """Epoch iterator producing ``MultimodalBatch`` pytrees (host numpy).

    Args:
        dataset: a MultimodalBaseDataset (or Incomplete subclass).
        batch_size: global batch size (across all processes).
        shuffle: reshuffle each epoch with a per-epoch seed.
        seed: base RNG seed for shuffling.
        drop_last: drop the final partial batch instead of padding it.
        num_processes / process_index: multi-host sharding of the epoch.
    """

    def __init__(self, dataset: MultimodalBaseDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = False,
                 num_processes: int = 1, process_index: int = 0):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_processes = num_processes
        self.process_index = process_index
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    @property
    def per_process_batch(self) -> int:
        if self.batch_size % self.num_processes:
            raise ValueError(
                f"Global batch size {self.batch_size} must divide evenly over "
                f"{self.num_processes} processes"
            )
        return self.batch_size // self.num_processes

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    def _epoch_permutation(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            return rng.permutation(n)
        return np.arange(n)

    def epoch_plan(self) -> tuple:
        """The epoch's full batch composition as two host arrays.

        Returns ``(idx, weights)`` of shape (n_batches, per_process_batch):
        row b holds this process's dataset indices for batch b and the
        matching sample weights (0 on wrap-around padding rows). This is
        THE definition of an epoch — ``__iter__`` gathers from it, and the
        device-resident cache path uploads it and gathers on device, so
        both paths see bit-identical batches by construction.
        """
        local = self.per_process_batch
        return self._plan(self.process_index * local, local)

    def global_epoch_plan(self) -> tuple:
        """The epoch plan at GLOBAL batch width, identical on every
        process (the permutation derives from the shared seed alone).
        Multi-host device-cache programs consume this: the cache holds
        global rows and the jitted gather produces the global batch
        sharded over the mesh's "data" axis, so each device still only
        computes its slice. Single-process, equals ``epoch_plan``."""
        return self._plan(0, self.batch_size)

    def _plan(self, lo: int, width: int) -> tuple:
        perm = self._epoch_permutation()
        bs = self.batch_size
        n_batches = len(self)
        idx_rows = np.empty((n_batches, width), dtype=np.int32)
        w_rows = np.ones((n_batches, width), dtype=np.float32)
        for b in range(n_batches):
            idx = perm[b * bs: (b + 1) * bs]
            pad = bs - len(idx)
            if pad:
                # wrap-around padding (cycling if pad > dataset size);
                # pads carry zero weight
                idx = np.concatenate([idx, np.resize(perm, pad)])
            # carve out this process's slice of the global batch
            idx_rows[b] = idx[lo: lo + width]
            if pad:
                weights = np.ones(bs, dtype=np.float32)
                weights[bs - pad:] = 0.0
                w_rows[b] = weights[lo: lo + width]
        return idx_rows, w_rows

    def __iter__(self) -> Iterator[MultimodalBatch]:
        idx_rows, w_rows = self.epoch_plan()
        for local_idx, local_w in zip(idx_rows, w_rows):
            raw = self.dataset.get_batch(local_idx)
            masks = raw.get("masks", None)
            yield batch_from_arrays(
                data=raw["data"],
                masks=masks,
                labels=raw.get("labels", None),
                weights=local_w,
            )
