"""Batch/visualization utilities (reference ``src/multivae/data/utils.py`` and
``data/datasets/utils.py:51-110``, plus a numpy ``make_grid`` replacing
torchvision's)."""

from __future__ import annotations

from math import ceil, floor
from typing import Dict

import numpy as np

from .batch import MultimodalBatch


def get_batch_size(inputs) -> int:
    """Reference ``data/utils.py:48-51``."""
    if isinstance(inputs, MultimodalBatch):
        return inputs.n_samples
    data = inputs["data"] if isinstance(inputs, dict) else inputs.data
    k = list(data.keys())[0]
    v = data[k]
    if isinstance(v, dict):
        v = next(iter(v.values()))
    return len(v)


def drop_unused_modalities(inputs):
    """Drop modalities missing for an entire batch.

    Reference ``data/utils.py:54-64``. On TPU this is usually unnecessary —
    the mask machinery already gives zero loss and zero gradient to missing
    modalities (SURVEY §7.3) — but dropping statically can still save
    compute when a modality is absent for the whole batch.
    """
    masks = getattr(inputs, "masks", None)
    if masks is None and isinstance(inputs, dict):
        masks = inputs.get("masks", None)
    if masks is None:
        return inputs
    data = inputs["data"] if isinstance(inputs, dict) else inputs.data
    for m in list(masks.keys()):
        if not np.any(np.asarray(masks[m])):
            data.pop(m)
            masks.pop(m)
    return inputs


def adapt_shape(data: Dict[str, np.ndarray]):
    """Pad/expand every modality to (n, 3, h, w) with common h, w.

    numpy port of reference ``data/datasets/utils.py:51-110``.
    """
    out = {}
    for m in data:
        x = np.asarray(data[m])
        if x.ndim == 1:
            x = x[:, None]
        if x.ndim == 2:
            x = x[:, None]
        if x.ndim == 3:
            x = x[:, None]
        if x.ndim == 4:
            if x.shape[1] == 1:
                x = np.concatenate([x] * 3, axis=1)
            elif x.shape[1] == 2:
                n, _, h, w = x.shape
                x = np.concatenate([x, np.zeros((n, 1, h, w), x.dtype)], axis=1)
            else:
                x = x[:, :3]
        else:
            raise AttributeError(
                "Can't visualize data with more than 3 dimensions"
            )
        out[m] = x

    h = max(out[m].shape[2] for m in out)
    w = max(out[m].shape[3] for m in out)
    for m in out:
        hm, wm = out[m].shape[2:]
        out[m] = np.pad(
            out[m],
            (
                (0, 0), (0, 0),
                (floor((h - hm) / 2), ceil((h - hm) / 2)),
                (floor((w - wm) / 2), ceil((w - wm) / 2)),
            ),
            mode="constant",
        )
    return out, (3, h, w)


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Arrange (N, C, H, W) images into a (C, H', W') grid.

    numpy equivalent of torchvision.utils.make_grid (used by the trainer's
    prediction images, reference ``base_trainer.py:815-885``).
    """
    images = np.asarray(images)
    n, c, h, w = images.shape
    ncols = min(nrow, n)
    nrows = int(ceil(n / ncols))
    grid = np.full(
        (c, padding + nrows * (h + padding), padding + ncols * (w + padding)),
        pad_value, dtype=images.dtype,
    )
    for idx in range(n):
        r, col = divmod(idx, ncols)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[:, y:y + h, x:x + w] = images[idx]
    return grid


def grid_to_pil(grid: np.ndarray):
    """(C, H, W) float grid in [0,1] -> PIL image (uint8)."""
    from PIL import Image

    arr = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)
    arr = np.transpose(arr, (1, 2, 0))
    return Image.fromarray(arr)
