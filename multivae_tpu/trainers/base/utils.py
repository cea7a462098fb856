"""Trainer utilities (reference ``src/multivae/trainers/base/utils.py``)."""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int):
    """Seed python and numpy RNGs. JAX randomness is keyed explicitly from
    the trainer state, so no global JAX seed exists (by design)."""
    random.seed(seed)
    np.random.seed(seed)


def update_dict(dict1: dict, dict2: dict):
    """In-place add values of dict2 into dict1 (reference ``utils.py:20-27``)."""
    for k in dict2:
        if k in dict1:
            dict1[k] = dict1[k] + dict2[k]
        else:
            dict1[k] = dict2[k]
    return dict1
