from .base import BaseModel, BaseMultiVAE, BaseMultiVAEConfig
from .crmvae import CRMVAE, CRMVAEConfig
from .dmvae import DMVAE, DMVAEConfig
from .mopoe import MoPoE, MoPoEConfig
from .mvae import MVAE, MVAEConfig
from .mvtcae import MVTCAE, MVTCAEConfig

__all__ = [
    "BaseModel",
    "BaseMultiVAE",
    "BaseMultiVAEConfig",
    "CRMVAE",
    "CRMVAEConfig",
    "DMVAE",
    "DMVAEConfig",
    "MoPoE",
    "MoPoEConfig",
    "MVAE",
    "MVAEConfig",
    "MVTCAE",
    "MVTCAEConfig",
]
