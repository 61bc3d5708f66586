from .mesh import MeshConfig, build_mesh, batch_partition_spec
from .sharding import (
    ShardingPolicy,
    fsdp_partition_spec,
    named_sharding,
    tree_shardings,
    host_offload_supported,
)

__all__ = [
    "MeshConfig",
    "build_mesh",
    "batch_partition_spec",
    "ShardingPolicy",
    "fsdp_partition_spec",
    "named_sharding",
    "tree_shardings",
    "host_offload_supported",
]
