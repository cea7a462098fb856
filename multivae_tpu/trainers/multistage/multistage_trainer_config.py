"""Multistage trainer config (reference
``src/multivae/trainers/multistage/multistage_trainer_config.py``)."""

from __future__ import annotations

from pydantic.dataclasses import dataclass

from ..base.base_trainer_config import BaseTrainerConfig


@dataclass
class MultistageTrainerConfig(BaseTrainerConfig):
    """Training config for multistage models (JNF / TELBO)."""
