from .optimizer import build_optimizer, build_schedule
from .step import TrainSession, TrainState

__all__ = ["build_optimizer", "build_schedule", "TrainSession", "TrainState"]
