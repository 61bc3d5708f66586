"""Int8-quantized parameter all-gather: the ZeRO-3++ ``zero_quantized_weights``
analog (reference ``src/train.py:196-201``).

Under plain zero_3, GSPMD all-gathers bf16/f32 parameters per layer. ZeRO-3++
halves (vs bf16) or quarters (vs f32) that communication by gathering int8
blocks with per-block scales and dequantizing after. Here the same trade is
expressed with ``shard_map`` over the ``data`` axis: each device symmetric-
quantizes its local shard (per-row absmax scales), all-gathers the int8
payload + f32 scales over ICI, and dequantizes to the compute dtype.

Applied to a parameter tree via ``quantized_gather_tree`` inside the train
step when ``ShardingPolicy.quantized_comms`` is set; arrays whose sharded
bytes are tiny (biases, norms) gather unquantized -- the reference's
persistence-threshold behavior.
"""

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import AXIS_DATA


def _quantize_rows(x: jax.Array):
    """Symmetric int8 with one f32 scale per leading-dim row."""
    flat = x.reshape(x.shape[0], -1).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(flat), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(flat / scale), -127, 127).astype(jnp.int8)
    return q.reshape(x.shape), scale[:, 0]


def _dequantize_rows(q: jax.Array, scale: jax.Array, dtype):
    flat = q.reshape(q.shape[0], -1).astype(jnp.float32) * scale[:, None]
    return flat.reshape(q.shape).astype(dtype)


def quantized_all_gather(x_sharded: jax.Array, mesh: Mesh, spec: P, out_dtype=None, axis: str = AXIS_DATA):
    """All-gather a data-axis-sharded array as int8 + scales.

    ``spec`` is the array's partition spec (exactly one dim sharded on
    ``axis``); returns the replicated (on that axis) dequantized array.
    """
    if out_dtype is None:
        out_dtype = x_sharded.dtype
    dims = [i for i, s in enumerate(spec) if s == axis]
    assert len(dims) == 1, f"need exactly one {axis}-sharded dim in {spec}"
    dim = dims[0]

    def local_fn(shard):
        # shard has the local block; move the sharded dim in front so the
        # per-row scales follow the gather dimension
        moved = jnp.moveaxis(shard, dim, 0)
        q, scale = _quantize_rows(moved)
        q_full = jax.lax.all_gather(q, axis, tiled=True)
        s_full = jax.lax.all_gather(scale, axis, tiled=True)
        deq = _dequantize_rows(q_full, s_full, out_dtype)
        return jnp.moveaxis(deq, 0, dim)

    out_spec = P(*[None if s == axis else s for s in spec])
    # check_rep=False: inputs replicated over the unused replica/model axes
    # can't be statically proven replicated by shard_map's rep-checker
    return shard_map(local_fn, mesh=mesh, in_specs=(spec,), out_specs=out_spec, check_rep=False)(x_sharded)


def quantized_gather_tree(params, shardings, mesh: Mesh, out_dtype=None, min_bytes: int = 1 << 16):
    """Gather a zero_3-sharded parameter tree with int8 communication.

    ``shardings`` is the matching NamedSharding tree. Leaves not sharded on
    the data axis (or smaller than ``min_bytes``) pass through untouched
    (GSPMD replicates them normally -- the persistence-threshold analog).
    """
    def gather_leaf(x, sh):
        if not isinstance(sh, NamedSharding):
            return x
        spec = sh.spec
        if AXIS_DATA not in tuple(spec):
            return x
        if x.size * x.dtype.itemsize // mesh.shape[AXIS_DATA] < min_bytes:
            return x
        return quantized_all_gather(x, mesh, spec, out_dtype=out_dtype)

    return jax.tree.map(gather_leaf, params, shardings)
