"""MVAE config (reference ``src/multivae/models/mvae/mvae_config.py``)."""

from __future__ import annotations

from pydantic.dataclasses import dataclass

from ..base.base_config import BaseMultiVAEConfig


@dataclass
class MVAEConfig(BaseMultiVAEConfig):
    """Config for the MVAE model ('Multimodal Generative Models for Scalable
    Weakly-Supervised Learning', NeurIPS 2018).

    Args:
        use_subsampling: besides the joint ELBO, also optimize unimodal
            ELBOs and k random subset ELBOs. Set False on already-incomplete
            datasets.
        k: number of random subset ELBOs per step.
        warmup: KL terms annealed linearly over the first ``warmup`` epochs.
        beta: scaling for the divergence term.
    """

    use_subsampling: bool = True
    k: int = 0
    warmup: int = 10
    beta: float = 1.0
