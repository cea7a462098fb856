from .base import Evaluator, EvaluatorConfig
from .coherences import CoherenceEvaluator, CoherenceEvaluatorConfig
from .fids import FIDEvaluator, FIDEvaluatorConfig
from .latent_clustering import Clustering, ClusteringConfig
from .likelihoods import LikelihoodsEvaluator, LikelihoodsEvaluatorConfig
from .reconstruction import Reconstruction, ReconstructionConfig
from .visualization import Visualization, VisualizationConfig

__all__ = [
    "Clustering",
    "ClusteringConfig",
    "CoherenceEvaluator",
    "CoherenceEvaluatorConfig",
    "Evaluator",
    "EvaluatorConfig",
    "FIDEvaluator",
    "FIDEvaluatorConfig",
    "LikelihoodsEvaluator",
    "LikelihoodsEvaluatorConfig",
    "Reconstruction",
    "ReconstructionConfig",
    "Visualization",
    "VisualizationConfig",
]
