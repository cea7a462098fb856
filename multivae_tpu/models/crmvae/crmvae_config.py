"""CRMVAE config (reference ``src/multivae/models/crmvae/crmvae_config.py``)."""

from __future__ import annotations

from pydantic.dataclasses import dataclass

from ..base.base_config import BaseMultiVAEConfig


@dataclass
class CRMVAEConfig(BaseMultiVAEConfig):
    """Config for CRMVAE (coordination-based multimodal VAE,
    https://openreview.net/forum?id=Rn8u4MYgeNJ).

    Args:
        beta: weights the sum of all KL terms. Default 2.5.
    """

    beta: float = 2.5
