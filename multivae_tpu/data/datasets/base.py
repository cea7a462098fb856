"""Multimodal dataset bases (numpy-backed, batch-gather oriented).

TPU-native equivalent of the reference dataset layer
(``src/multivae/data/datasets/base.py``). Differences by design:

- Storage is host numpy; batches are gathered with vectorized fancy
  indexing (``get_batch``) instead of per-item ``__getitem__`` + collate —
  one contiguous host gather per step feeds the device transfer.
- ``IncompleteDataset`` keeps the reference convention: missing entries are
  zero-filled *at the right shape* and a boolean mask per modality carries
  availability (``base.py:124-143``).
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import numpy as np

from ...utils.model_output import ModelOutput


class DatasetOutput(ModelOutput):
    """Attr-dict returned by ``__getitem__`` (parity with pythae's)."""


def _as_numpy(x):
    if isinstance(x, dict):
        return {k: _as_numpy(v) for k, v in x.items()}
    if hasattr(x, "detach"):  # torch tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _length(value) -> int:
    if isinstance(value, dict):
        value = next(iter(value.values()))
    return len(value)


def _take(value, index):
    if isinstance(value, dict):
        return {k: _take(v, index) for k, v in value.items()}
    if (isinstance(value, np.ndarray) and isinstance(index, np.ndarray)
            and index.ndim == 1 and value.ndim >= 2
            and value.dtype.itemsize * value[0].size >= 512):
        # large rows: threaded native gather (falls back to numpy)
        from ..native_gather import gather_rows

        return gather_rows(value, index)
    return value[index]


class MultimodalBaseDataset:
    """Base class for multimodal datasets.

    Args:
        data: dict modality name -> array (n_samples, *dims). Values may be
            nested dicts for token modalities.
        labels: optional (n_samples,) array.
    """

    def __init__(self, data: dict, labels=None):
        self.data = _as_numpy(data)
        self.labels = None if labels is None else _as_numpy(labels)
        self._check_lengths()

    def _check_lengths(self):
        length = _length(self.data[list(self.data)[0]])
        for m in self.data:
            if _length(self.data[m]) != length:
                raise AttributeError(
                    "The size of the provided datasets doesn't correspond "
                    "between modalities!"
                )
        if self.labels is not None and len(self.labels) != length:
            raise AttributeError(
                "The size of the provided labels doesn't correspond to the data"
            )

    def __len__(self):
        return _length(self.data[list(self.data)[0]])

    def __getitem__(self, index):
        X = {m: _take(self.data[m], index) for m in self.data}
        if self.labels is not None:
            return DatasetOutput(data=X, labels=self.labels[index])
        return DatasetOutput(data=X)

    def get_batch(self, indices: np.ndarray) -> DatasetOutput:
        """Vectorized gather of a batch of samples by index array."""
        X = {m: _take(self.data[m], indices) for m in self.data}
        out = DatasetOutput(data=X)
        if self.labels is not None:
            out["labels"] = self.labels[indices]
        return out

    def transform_for_plotting(self, tensor, modality):
        """Hook for mapping model-space tensors to plottable images.

        Reference: ``src/multivae/data/datasets/base.py:73-97``.
        """
        return tensor


class IncompleteDataset(MultimodalBaseDataset):
    """Multimodal dataset with per-modality availability masks.

    Missing entries must be zero-filled at the right shape in ``data``; the
    boolean ``masks[m][i]`` says whether sample i's modality m is real.
    Reference: ``src/multivae/data/datasets/base.py:100-206``.
    """

    def __init__(self, data: dict, masks: Dict[str, np.ndarray], labels=None):
        self.masks = {k: np.asarray(_as_numpy(v)).astype(bool) for k, v in masks.items()}
        super().__init__(data, labels)

    def _check_lengths(self):
        super()._check_lengths()
        length = len(self)
        for m in self.data:
            if m not in self.masks or len(self.masks[m]) != length:
                raise AttributeError(
                    "The size of the provided datasets/masks doesn't "
                    "correspond between modalities!"
                )

    def __getitem__(self, index):
        out = super().__getitem__(index)
        out["masks"] = {m: self.masks[m][index] for m in self.masks}
        return out

    def get_batch(self, indices: np.ndarray) -> DatasetOutput:
        out = super().get_batch(indices)
        out["masks"] = {m: self.masks[m][indices] for m in self.masks}
        return out


class ResampleDataset(MultimodalBaseDataset):
    """Index-remapping view over another dataset.

    Reference: ``src/multivae/data/datasets/utils.py:10-48``.
    """

    def __init__(self, dataset: MultimodalBaseDataset, indices=None):
        self.dataset = dataset
        if indices is None:
            indices = np.arange(len(dataset))
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, index):
        return self.dataset[self.indices[index]]

    def get_batch(self, indices: np.ndarray) -> DatasetOutput:
        return self.dataset.get_batch(self.indices[indices])

    @property
    def labels(self):
        base_labels = getattr(self.dataset, "labels", None)
        return None if base_labels is None else base_labels[self.indices]

    def transform_for_plotting(self, tensor, modality):
        return self.dataset.transform_for_plotting(tensor, modality)


def random_split(dataset, fractions, seed: int = 0):
    """Split a dataset into ResampleDataset views (torch.utils.data
    ``random_split`` parity, used by the reference case studies for a
    90/10 train/eval split).

    Args:
        dataset: any multimodal dataset.
        fractions: sequence of floats summing to 1 (e.g. ``[0.9, 0.1]``).
        seed: permutation seed.
    """
    fracs = np.asarray(list(fractions), dtype=np.float64)
    if not np.isclose(fracs.sum(), 1.0):
        raise ValueError(f"fractions must sum to 1, got {fracs.sum()}")
    n = len(dataset)
    perm = np.random.default_rng(seed).permutation(n)
    sizes = np.floor(fracs * n).astype(int)
    sizes[0] += n - sizes.sum()  # remainder to the first split (torch puts
    # remainders on the earliest splits; exact parity is not required)
    out, start = [], 0
    for s in sizes:
        out.append(ResampleDataset(dataset, perm[start:start + s]))
        start += s
    return out
