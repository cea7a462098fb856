"""MNIST image + one-hot label bimodal dataset.

Reference: ``src/multivae/data/datasets/mnist_labels.py``: modality
'images' is (1, 28, 28) in [0,1]; modality 'labels' is the one-hot class
vector with an extra middle axis (1, 10).
"""

from __future__ import annotations

import numpy as np

from .base import MultimodalBaseDataset
from .mnist_svhn import load_mnist


class MnistLabels(MultimodalBaseDataset):
    """MNIST with labels as a second modality."""

    def __init__(self, data_path: str, split: str = "train",
                 download: bool = False, **kwargs):
        if split not in ["train", "test"]:
            raise AttributeError(
                "Possible values for split are 'train' or 'test'"
            )
        images, labels = load_mnist(data_path, train=(split == "train"))
        images = (images.astype(np.float32) / 255.0)[:, None]
        one_hot = np.eye(10, dtype=np.float32)[labels][:, None, :]  # (N,1,10)
        super().__init__(
            data=dict(images=images, labels=one_hot), labels=labels
        )
