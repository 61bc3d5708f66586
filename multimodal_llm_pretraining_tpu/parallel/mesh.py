"""Device-mesh construction.

The reference's entire distribution backend is NCCL environment tuning plus
torchrunx process fan-out (``.env:5``, ``src/train.py:68-71``,
``experiments/utils/distribute.py:37-61``). On TPU none of that exists: we
build one global ``jax.sharding.Mesh`` and let GSPMD place XLA collectives on
ICI/DCN. Three named axes:

- ``replica`` -- pure data-parallel replication. Size > 1 only for
  hybrid-sharding methods (shard within a host/slice over ``data``, replicate
  across hosts over ``replica``), the analog of torch FSDP ``HYBRID_SHARD``
  and DeepSpeed ZeRO-3++ hpZ hierarchical partitioning (``src/train.py:196-201``).
- ``data``   -- the batch / ZeRO-sharding axis (rides ICI).
- ``model``  -- tensor-parallel axis (GSPMD makes this nearly free; the
  reference has no TP at all, so default size is 1).
"""

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

AXIS_REPLICA = "replica"
AXIS_DATA = "data"
AXIS_MODEL = "model"

DATA_AXES = (AXIS_REPLICA, AXIS_DATA)


@dataclass(frozen=True)
class MeshConfig:
    """Logical topology request.

    ``hybrid=True`` splits devices into (replica=num_hosts, data=chips_per_host)
    so that parameter all-gathers stay on ICI while only gradient all-reduces
    cross DCN. ``tensor_parallel`` > 1 carves a model axis out of the data axis.
    """

    num_hosts: int = 1
    chips_per_host: int = 1
    hybrid: bool = False
    tensor_parallel: int = 1

    @property
    def num_devices(self) -> int:
        return self.num_hosts * self.chips_per_host


def build_mesh(config: MeshConfig, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = config.num_devices
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    devices = np.asarray(devices[:n])

    tp = config.tensor_parallel
    if n % tp != 0:
        raise ValueError(f"tensor_parallel={tp} must divide device count {n}")
    dp_total = n // tp

    if config.hybrid:
        replica = config.num_hosts
        if dp_total % replica != 0:
            raise ValueError(f"hybrid mesh needs num_hosts={replica} to divide dp size {dp_total}")
        data = dp_total // replica
    else:
        replica = 1
        data = dp_total

    mesh_devices = devices.reshape(replica, data, tp)
    return Mesh(mesh_devices, (AXIS_REPLICA, AXIS_DATA, AXIS_MODEL))


def batch_partition_spec(ndim: int = 1) -> P:
    """Batch arrays are sharded over both data-parallel axes on dim 0."""
    return P(DATA_AXES, *([None] * (ndim - 1)))
