from .base import BaseModel, BaseMultiVAE, BaseMultiVAEConfig
from .mvtcae import MVTCAE, MVTCAEConfig

__all__ = [
    "BaseModel",
    "BaseMultiVAE",
    "BaseMultiVAEConfig",
    "MVTCAE",
    "MVTCAEConfig",
]
