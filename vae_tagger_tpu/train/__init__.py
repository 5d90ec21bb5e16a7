from .schedule import build_lr_schedule
from .state import TrainState, build_optimizer

__all__ = ["build_lr_schedule", "TrainState", "build_optimizer"]
