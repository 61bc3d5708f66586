"""Multi-host execution.

The reference fans out one worker process per GPU per host via torchrunx and
returns rank 0's result (``experiments/utils/distribute.py:37-61``). JAX
SPMD needs exactly one process per TPU host, all running the same program:
``distribute`` initializes ``jax.distributed`` from MLPT_*/SLURM env vars
when they're present (multi-host), then simply calls the function -- every
host computes the same result, rank 0's is returned by convention.

Launching the processes themselves is normally the cluster's job: SLURM
``srun`` (``slurm.py``) or ``gcloud compute tpus tpu-vm ssh --worker=all``
running the identical command. For bare hosts without a scheduler,
``launcher.Launcher`` (``scripts/launch.py``) provides the in-band SSH
fan-out itself -- the torchrunx analog.
"""

import os
from typing import Any, Callable

from ..utils import get_logger

logger = get_logger()

_initialized = False


def maybe_init_distributed() -> int:
    """Initialize jax.distributed from env; returns this process's index."""
    global _initialized
    coord = os.environ.get("MLPT_COORDINATOR_ADDRESS")
    nprocs = int(os.environ.get("MLPT_NUM_PROCESSES", "1"))
    pid = int(os.environ.get("MLPT_PROCESS_INDEX", "0"))
    if coord and nprocs > 1 and not _initialized:
        import jax

        jax.distributed.initialize(coordinator_address=coord, num_processes=nprocs, process_id=pid)
        _initialized = True
        logger.info(f"jax.distributed initialized: process {pid}/{nprocs} @ {coord}")
    return pid


def distribute(
    func: Callable,
    func_kwargs: dict[str, Any] | None = None,
    workers_per_host: int | None = None,  # parity arg; JAX drives all local chips from one process
) -> Any:
    maybe_init_distributed()
    return func(**(func_kwargs or {}))
