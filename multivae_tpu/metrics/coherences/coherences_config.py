"""Coherence evaluator config (reference
``src/multivae/metrics/coherences/coherences_config.py``)."""

from __future__ import annotations

from typing import Optional

from pydantic.dataclasses import dataclass

from ..base.evaluator_config import EvaluatorConfig


@dataclass
class CoherenceEvaluatorConfig(EvaluatorConfig):
    """Config for coherence evaluation.

    Args:
        num_classes: number of label classes.
        include_recon: include self-reconstructions in cross-coherences.
        nb_samples_for_joint: samples for the joint coherence.
        nb_samples_for_cross: posterior samples per datapoint for cross.
        give_details_per_class: log per-class accuracies.
        fused_sweep: evaluate ALL conditioning subsets in one compiled
            device call per test batch (classifier argmax computed
            in-graph) instead of a per-subset x per-batch dispatch loop.
            Requires a model with the traced-subset ``_encode_masked``
            path and jit-compatible classifiers; falls back to the
            sequential loop automatically otherwise. TPU-native
            extension, on by default.
    """

    num_classes: Optional[int] = 10
    include_recon: bool = False
    nb_samples_for_joint: int = 10000
    nb_samples_for_cross: int = 1
    give_details_per_class: bool = False
    fused_sweep: bool = True
