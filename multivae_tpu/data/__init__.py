from .batch import MultimodalBatch
from .datasets.base import (
    DatasetOutput,
    IncompleteDataset,
    MultimodalBaseDataset,
    ResampleDataset,
    random_split,
)
from .loader import DataLoader

__all__ = [
    "DataLoader",
    "DatasetOutput",
    "IncompleteDataset",
    "MultimodalBaseDataset",
    "MultimodalBatch",
    "ResampleDataset",
    "random_split",
]
