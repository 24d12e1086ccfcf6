from .base import (BaseExecutor, MetricsLogger, TrainConfig, TrainState,
                   load_params, make_optimizer, save_params)
from .flmr_executor import FLMRExecutor
from .rag_executor import RagConfig, RagExecutor

__all__ = ["BaseExecutor", "MetricsLogger", "TrainConfig", "TrainState",
           "load_params", "make_optimizer", "save_params", "FLMRExecutor",
           "RagConfig", "RagExecutor"]

from .pretraining_executor import FLMRVisionPretrainingExecutor  # noqa: E402
from .dpr_executor import DPRExecutor  # noqa: E402
__all__ += ["FLMRVisionPretrainingExecutor", "DPRExecutor"]
