from .cache import MemoryWorkspace, StepCall, Workspace, get_workspace, step
from .config import BaseConfig, TrainingConfig
from .base_classes import Experiment, Sweep
from .slurm import SlurmJob
from .distribute import distribute

__all__ = [
    "step",
    "StepCall",
    "Workspace",
    "MemoryWorkspace",
    "get_workspace",
    "BaseConfig",
    "TrainingConfig",
    "Experiment",
    "Sweep",
    "SlurmJob",
    "distribute",
]
