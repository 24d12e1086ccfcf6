from .base import (BaseExecutor, MetricsLogger, TrainConfig, TrainState,
                   load_params, make_optimizer, save_params)
from .flmr_executor import FLMRExecutor
from .rag_executor import RagConfig, RagExecutor

__all__ = ["BaseExecutor", "MetricsLogger", "TrainConfig", "TrainState",
           "load_params", "make_optimizer", "save_params", "FLMRExecutor",
           "RagConfig", "RagExecutor"]
