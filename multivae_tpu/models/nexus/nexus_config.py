"""Nexus config (reference ``src/multivae/models/nexus/nexus_config.py``)."""

from __future__ import annotations

from typing import Dict, List, Literal, Union

from pydantic.dataclasses import dataclass

from ..base.base_config import BaseMultiVAEConfig


@dataclass
class NexusConfig(BaseMultiVAEConfig):
    """Config for Nexus ('Leveraging hierarchy in multimodal generative
    models for effective cross-modality inference', Vasco et al 2022).

    Args:
        modalities_specific_dim: bottom latent dim per modality.
        bottom_betas: per-modality bottom KL scales.
        dropout_rate: forced perceptual dropout rate during training.
        msg_dim: dimension of each modality's message.
        aggregator: only 'mean' is supported.
        top_beta: scales the top-level KL.
        gammas: per-modality top reconstruction scales.
        warmup: KL annealing epochs.
        adapt_top_decoder_variance: modalities whose top-decoder scale is
            set to the RMS reconstruction error.
    """

    modalities_specific_dim: Union[Dict[str, int], None] = None
    bottom_betas: Union[Dict[str, float], None] = None
    dropout_rate: float = 0.0
    msg_dim: int = 10
    aggregator: Literal["mean"] = "mean"
    top_beta: float = 1.0
    gammas: Union[Dict[str, float], None] = None
    warmup: int = 20
    adapt_top_decoder_variance: Union[List[str], None] = None
