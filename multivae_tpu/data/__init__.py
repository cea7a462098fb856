from .batch import MultimodalBatch
from .datasets.base import (
    DatasetOutput,
    IncompleteDataset,
    MultimodalBaseDataset,
    ResampleDataset,
    random_split,
)
from .device_cache import (DeviceDataCache, build_device_cache,
                           release_sampler_cache)
from .loader import DataLoader

__all__ = [
    "DataLoader",
    "DatasetOutput",
    "DeviceDataCache",
    "IncompleteDataset",
    "MultimodalBaseDataset",
    "MultimodalBatch",
    "ResampleDataset",
    "build_device_cache",
    "release_sampler_cache",
    "random_split",
]
