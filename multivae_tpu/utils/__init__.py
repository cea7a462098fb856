from .model_output import ModelOutput
from .config import BaseConfig

__all__ = ["ModelOutput", "BaseConfig"]
