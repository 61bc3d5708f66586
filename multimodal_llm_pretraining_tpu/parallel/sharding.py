"""ZeRO/FSDP-style sharding policies as GSPMD partition specs.

The reference configures DeepSpeed ZeRO stages 1/2/3/3++ and torch-FSDP
sharding variants through generated JSON/TrainingArguments
(``src/train.py:126-215``). Here each method is a declarative policy saying
which of {optimizer state, gradients, parameters} is sharded along the
``data`` mesh axis; XLA then materializes the matching collectives:

- opt state sharded            -> ZeRO-1 (``src/train.py:169-171``)
- + gradients sharded          -> ZeRO-2 / FSDP shard_grad_op: gradient
  all-reduce becomes reduce-scatter (``src/train.py:172-181``)
- + parameters sharded         -> ZeRO-3 / FSDP full_shard: per-layer
  all-gather of params (``src/train.py:182-194``)
- hybrid variants              -> same specs on a 2D (replica x data) mesh
  built with ``MeshConfig(hybrid=True)``: sharding stays on ICI, DCN only
  replicates (torch HYBRID_SHARD; DS hpZ ``src/train.py:196-201``)
- ZeRO-3++ quantized comms     -> int8 all-gather of bf16 params
  (``zero_quantized_weights``, ``src/train.py:196-201``); see
  ``ops/quantized_comm.py``
- offloading                   -> optimizer state placed in host memory via
  ``memory_kind='pinned_host'`` (DS/FSDP CPU offload, ``src/train.py:203-213``)
"""

import functools
import re
from dataclasses import dataclass
from typing import Literal

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_DATA, AXIS_MODEL

ShardModeT = Literal["replicated", "sharded"]

# Reference search-space values (experiments/config.py:31-35): "" plus
# fsdp_{shard_grad_op,full_shard,hybrid_shard_zero2,hybrid_shard} plus
# zero_{1,2,3,3++}.
ShardingMethodT = Literal[
    "",
    "zero_1",
    "zero_2",
    "zero_3",
    "zero_3++",
    "fsdp_shard_grad_op",
    "fsdp_full_shard",
    "fsdp_hybrid_shard_zero2",
    "fsdp_hybrid_shard",
]


@dataclass(frozen=True)
class ShardingPolicy:
    params: ShardModeT = "replicated"
    grads: ShardModeT = "replicated"
    opt_state: ShardModeT = "replicated"
    hybrid: bool = False  # requires a replica axis > 1 on the mesh
    quantized_comms: bool = False  # ZeRO-3++ zero_quantized_weights: int8 param all-gather
    quantized_grads: bool = False  # ZeRO-3++ zero_quantized_gradients: int8 grad reduce-scatter
    offload_optimizer: bool = False
    offload_params: bool = False

    @staticmethod
    def from_method(method: ShardingMethodT, offloading: bool = False) -> "ShardingPolicy":
        """Expand a search-grid sharding string the way
        ``TrainingConfig.training_class`` does (``experiments/config.py:54-75``):
        fsdp offloading offloads the whole unit; zero offloading offloads the
        optimizer always and params only at stage >= 3."""
        base = {
            "": dict(),
            "zero_1": dict(opt_state="sharded"),
            "zero_2": dict(opt_state="sharded", grads="sharded"),
            "zero_3": dict(opt_state="sharded", grads="sharded", params="sharded"),
            "zero_3++": dict(
                opt_state="sharded", grads="sharded", params="sharded",
                quantized_comms=True, quantized_grads=True, hybrid=True,
            ),
            "fsdp_shard_grad_op": dict(opt_state="sharded", grads="sharded"),
            "fsdp_full_shard": dict(opt_state="sharded", grads="sharded", params="sharded"),
            "fsdp_hybrid_shard_zero2": dict(opt_state="sharded", grads="sharded", hybrid=True),
            "fsdp_hybrid_shard": dict(opt_state="sharded", grads="sharded", params="sharded", hybrid=True),
        }[method]
        if offloading:
            if method.startswith("fsdp"):
                base = {**base, "offload_optimizer": True, "offload_params": method in ("fsdp_full_shard", "fsdp_hybrid_shard")}
            elif method.startswith("zero"):
                base = {**base, "offload_optimizer": True}
                if method in ("zero_3", "zero_3++"):
                    base["offload_params"] = True
        return ShardingPolicy(**base)  # type: ignore[arg-type]


def fsdp_partition_spec(shape: tuple[int, ...], data_axis_size: int, tp_spec: tuple | None = None) -> P:
    """Pick the sharding dim for one array: the largest dim divisible by the
    data-axis size that isn't already taken by a tensor-parallel axis.
    Small arrays (biases, layernorm scales) stay replicated -- same effect as
    FSDP only wrapping the big transformer blocks (``src/train.py:133-135``).

    ``tp_spec`` is a tuple of axis names right-aligned to the array rank
    (scanned layer stacks carry a leading layer dim the rules don't mention).
    """
    entries: list = [None] * len(shape)
    if tp_spec is not None:
        offset = len(shape) - len(tp_spec)
        for i, ax in enumerate(tp_spec):
            if 0 <= offset + i < len(shape) and ax == AXIS_MODEL:
                entries[offset + i] = ax
    if data_axis_size > 1:
        best_dim, best_size = None, 0
        for dim, size in enumerate(shape):
            if entries[dim] is not None:
                continue
            if size % data_axis_size == 0 and size > best_size:
                best_dim, best_size = dim, size
        if best_dim is not None:
            entries[best_dim] = AXIS_DATA
    while entries and entries[-1] is None:
        entries.pop()
    return P(*entries)


def named_sharding(mesh: Mesh, spec: P, offload: bool = False) -> NamedSharding:
    if offload and host_offload_supported():
        if fake_host_offload():
            # CI mode: "host" state stays in device memory (the CPU backend
            # cannot execute annotate_device_placement), but every streaming
            # code path -- grouping, chunking, init streaming, throttle,
            # real-Sharding out_shardings -- runs exactly as on the chip
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, spec, memory_kind="pinned_host")
    return NamedSharding(mesh, spec)


def fake_host_offload() -> bool:
    """MLPT_FAKE_HOST_OFFLOAD=1 exercises the offload orchestration off-TPU
    (tests/test_offload_cpu_exec.py); never set it on a real chip."""
    import os

    return os.environ.get("MLPT_FAKE_HOST_OFFLOAD") == "1" and jax.default_backend() != "tpu"


@functools.cache
def _host_memory_probe() -> bool:
    if jax.default_backend() != "tpu":
        return False
    try:
        dev = jax.local_devices()[0]
        dev.memory("pinned_host")
        return True
    except Exception:
        return False


def host_offload_supported() -> bool:
    """Whether this backend exposes a usable pinned_host memory space.
    Restricted to TPU: the CPU backend advertises the memory kind but cannot
    execute programs with host-memory out_shardings (annotate_device_placement
    is unimplemented on Host, and the SPMD partitioner rejects replicated
    side-effecting placement ops)."""
    return fake_host_offload() or _host_memory_probe()


def _leaf_spec(leaf, mode: ShardModeT, mesh: Mesh, tp_spec: tuple | None) -> P:
    shape = getattr(leaf, "shape", ())
    data_axis = mesh.shape[AXIS_DATA] if mode == "sharded" else 1
    if len(shape) == 0:
        return P()
    return fsdp_partition_spec(tuple(shape), data_axis, tp_spec)


def tree_shardings(
    tree,
    mesh: Mesh,
    mode: ShardModeT,
    offload: bool = False,
    tp_rules: list[tuple[str, P]] | None = None,
):
    """NamedSharding pytree for a pytree of arrays/ShapeDtypeStructs.

    ``tp_rules`` is an ordered [(path_regex, PartitionSpec)] list mapping
    parameter paths to tensor-parallel specs (the ``model`` axis); the FSDP
    rule then picks a *different* dim for the ``data`` axis, giving 2D
    parameter sharding when both are active.
    """
    compiled = [(re.compile(rx), spec) for rx, spec in (tp_rules or [])]
    has_model_axis = mesh.shape.get(AXIS_MODEL, 1) > 1

    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        pathstr = "/".join(str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path)
        tp_spec = None
        if has_model_axis:
            for rx, spec in compiled:
                if rx.search(pathstr):
                    tp_spec = spec
                    break
        spec = _leaf_spec(leaf, mode, mesh, tp_spec)
        out.append(named_sharding(mesh, spec, offload=offload))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_bytes_per_device(tree, mesh: Mesh, mode: ShardModeT) -> int:
    """Predicted per-device bytes for a pytree under a sharding mode (used by
    the memory-model path of the max-batch-size search)."""
    total = 0
    axis = mesh.shape[AXIS_DATA]
    for leaf in jax.tree.leaves(tree):
        shape = getattr(leaf, "shape", None)
        if shape is None:
            continue
        n = int(np.prod(shape)) if shape else 1
        itemsize = np.dtype(leaf.dtype).itemsize if hasattr(leaf, "dtype") else 4
        if mode == "sharded" and shape and any(s % axis == 0 for s in shape):
            n //= axis
        total += n * itemsize
    return total
