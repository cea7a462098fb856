from .base_trainer import BaseTrainer, TrainState
from .base_trainer_config import BaseTrainerConfig
from .callbacks import (
    CallbackHandler,
    JaxProfilerCallback,
    StepTimingCallback,
    MetricConsolePrinterCallback,
    ProgressBarCallback,
    TrainingCallback,
    WandbCallback,
)

__all__ = [
    "BaseTrainer",
    "BaseTrainerConfig",
    "TrainState",
    "CallbackHandler",
    "JaxProfilerCallback",
    "StepTimingCallback",
    "MetricConsolePrinterCallback",
    "ProgressBarCallback",
    "TrainingCallback",
    "WandbCallback",
]
