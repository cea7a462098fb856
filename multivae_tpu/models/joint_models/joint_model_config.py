"""Base config for joint-encoder models (reference
``src/multivae/models/joint_models/joint_model_config.py``)."""

from __future__ import annotations

from pydantic.dataclasses import dataclass

from ..base.base_config import BaseMultiVAEConfig


@dataclass
class BaseJointModelConfig(BaseMultiVAEConfig):
    """Base config for models that use a joint encoder over all modalities."""
