"""Base sampler config (reference
``src/multivae/samplers/base/base_sampler_config.py``)."""

from __future__ import annotations

from pydantic.dataclasses import dataclass

from ...utils.config import BaseConfig


@dataclass
class BaseSamplerConfig(BaseConfig):
    """Base configuration of a latent-space sampler."""
