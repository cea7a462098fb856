from .datasets.base import (
    DatasetOutput,
    IncompleteDataset,
    MultimodalBaseDataset,
)
from .batch import MultimodalBatch
from .loader import DataLoader

__all__ = [
    "DatasetOutput",
    "IncompleteDataset",
    "MultimodalBaseDataset",
    "MultimodalBatch",
    "DataLoader",
]
