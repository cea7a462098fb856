from .fids import AdaptShapeFID, FIDEvaluator
from .fids_config import FIDEvaluatorConfig

__all__ = ["AdaptShapeFID", "FIDEvaluator", "FIDEvaluatorConfig"]
