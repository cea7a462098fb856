"""PolyMNIST (MMNIST) dataset with synthetic MAR missingness.

Reference: ``src/multivae/data/datasets/mmnist.py``. Loads the five
``m{i}.pt`` modality files + ``labels.pt`` of the zenodo PolyMNIST archive
(torch checkpoints; torch-cpu is available for reading), or ``.npy``
equivalents. ``missing_ratio`` / ``keep_incomplete`` reproduce the
reference's Missing-At-Random protocol, including forcing m0 always
available and zero-erasing masked samples.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Literal

import numpy as np

from .base import MultimodalBaseDataset

logger = logging.getLogger(__name__)


def _load_array(path_pt: str):
    path_npy = path_pt.replace(".pt", ".npy")
    if os.path.exists(path_npy):
        return np.load(path_npy)
    if os.path.exists(path_pt):
        import torch

        return torch.load(path_pt, weights_only=True).numpy()
    raise FileNotFoundError(path_pt)


class MMNISTDataset(MultimodalBaseDataset):
    """Five-modality PolyMNIST.

    Args:
        data_path: folder containing ``MMNIST/<split>/m{i}.pt``.
        split: 'train' or 'test'.
        missing_ratio: fraction of missing samples per modality (MAR).
        keep_incomplete: keep incomplete samples with masks (True) or only
            fully observed samples (False).
    """

    def __init__(self, data_path: str, transform=None, target_transform=None,
                 split: Literal["train", "test"] = "train",
                 download: bool = False, missing_ratio: float = 0.0,
                 keep_incomplete: bool = True):
        data_path = os.path.expanduser(str(data_path))
        paths = [os.path.join(data_path, "MMNIST", split, f"m{i}.pt")
                 for i in range(5)]
        if not (os.path.exists(paths[0])
                or os.path.exists(paths[0].replace(".pt", ".npy"))):
            if download:
                from ..download import maybe_download_mmnist

                maybe_download_mmnist(data_path)
            if not (os.path.exists(paths[0])
                    or os.path.exists(paths[0].replace(".pt", ".npy"))):
                raise AttributeError(
                    "The PolyMNIST dataset is not available at the given "
                    "datapath. Pass download=True or fetch "
                    "https://zenodo.org/record/4899160/files/PolyMNIST.zip "
                    "and extract it there."
                )
        self.missing_ratio = missing_ratio
        self.keep_incomplete = keep_incomplete

        images = {f"m{i}": np.asarray(_load_array(paths[i]), np.float32)
                  for i in range(5)}
        labels = np.asarray(_load_array(
            os.path.join(data_path, "MMNIST", split, "labels.pt")
        )).astype(np.int64)
        self.num_files = len(labels)

        if missing_ratio > 0 and keep_incomplete:
            masks = {}
            for i in range(5):
                rng = np.random.default_rng(i)
                masks[f"m{i}"] = rng.binomial(
                    1, 1 - missing_ratio, size=self.num_files
                ).astype(bool)
            # ensure at least one modality available for every sample
            masks["m0"] = np.ones(self.num_files, bool)
            for k in masks:
                images[k] = images[k] * masks[k].reshape(
                    -1, *([1] * (images[k].ndim - 1))
                ).astype(np.float32)
            super().__init__(images, labels)
            self.masks = masks
            self._incomplete = True
        elif missing_ratio > 0 and not keep_incomplete:
            # keep only the first ceil((1-r)^4 * n) samples
            # (reference __len__ semantics, ``mmnist.py:171-177``)
            new_len = math.ceil((1 - missing_ratio) ** 4 * self.num_files)
            images = {k: v[:new_len] for k, v in images.items()}
            labels = labels[:new_len]
            super().__init__(images, labels)
            self._incomplete = False
        else:
            super().__init__(images, labels)
            self._incomplete = False

    def __getitem__(self, index):
        out = MultimodalBaseDataset.__getitem__(self, index)
        if self._incomplete:
            out["masks"] = {m: self.masks[m][index] for m in self.masks}
        return out

    def get_batch(self, indices):
        out = MultimodalBaseDataset.get_batch(self, indices)
        if self._incomplete:
            out["masks"] = {m: self.masks[m][indices] for m in self.masks}
        return out
