"""Modality-subset machinery as precomputed mask matrices.

The reference enumerates modality subsets with Python loops over
``itertools.combinations`` at *runtime* inside the model forward
(MoPoE ``src/multivae/models/mopoe/mopoe_model.py:76-106``, MVAE
``mvae_model.py:48-52``, MHVAE ``mhvae_model.py:103``). On TPU we precompute
an (n_subsets x n_modalities) binary mask matrix once at model construction;
per-subset PoE/KL terms then become one batched einsum/vmap over the subset
axis inside a single compiled program.
"""

from __future__ import annotations

from itertools import chain, combinations
from typing import List, Sequence, Tuple

import numpy as np


def all_subsets(modalities: Sequence[str], include_empty: bool = False,
                include_full: bool = True) -> List[Tuple[str, ...]]:
    """All subsets of the modality list, ordered by size then position.

    Mirrors reference MoPoE ``all_subsets`` (``mopoe_model.py:76-86``).
    """
    mods = list(modalities)
    start = 0 if include_empty else 1
    end = len(mods) + 1 if include_full else len(mods)
    return list(
        chain.from_iterable(combinations(mods, n) for n in range(start, end))
    )


def subsets_to_mask(subsets: Sequence[Sequence[str]],
                    modalities: Sequence[str]) -> np.ndarray:
    """Build the (n_subsets, n_modalities) float32 membership matrix."""
    mod_index = {m: i for i, m in enumerate(modalities)}
    mask = np.zeros((len(subsets), len(modalities)), dtype=np.float32)
    for s, subset in enumerate(subsets):
        for m in subset:
            mask[s, mod_index[m]] = 1.0
    return mask


def all_subsets_mask(modalities: Sequence[str], include_empty: bool = False,
                     include_full: bool = True) -> Tuple[List[Tuple[str, ...]], np.ndarray]:
    """Convenience: (subset name tuples, membership mask matrix)."""
    subsets = all_subsets(modalities, include_empty, include_full)
    return subsets, subsets_to_mask(subsets, modalities)
