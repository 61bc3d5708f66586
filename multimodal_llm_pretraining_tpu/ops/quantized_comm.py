"""Int8-quantized ZeRO-3++ collectives (reference ``src/train.py:196-201``).

Under plain zero_3, GSPMD all-gathers bf16/f32 parameters per layer and
reduce-scatters gradients in full precision. ZeRO-3++ (DeepSpeed's
``zero_quantized_weights`` + ``zero_quantized_gradients``) halves (vs bf16)
or quarters (vs f32) both directions by moving int8 payloads with per-block
scales. Here the same trade is expressed with ``shard_map`` over the
``data`` axis:

- **forward** (``zero_quantized_weights``): each device symmetric-quantizes
  its local shard (per-row absmax scales), all-gathers the int8 payload +
  f32 scales over ICI, and dequantizes to the compute dtype.
- **backward** (``zero_quantized_gradients``): the cotangent each device
  holds is its *partial* (local-batch) gradient of the gathered array. It is
  chunked by destination shard, quantized per row, exchanged with a single
  int8 ``all_to_all``, dequantized, and summed -- an int8 reduce-scatter on
  the pre-reduction partials, exactly where DeepSpeed quantizes.

The fwd/bwd pair is a ``jax.custom_vjp`` on the per-device body: the
quantization nonlinearity (round, int8 cast) has a zero VJP, so without the
custom rule gradients of every gathered parameter would be destroyed. With
``quantized_grads=False`` the backward is an exact ``psum_scatter``
(straight-through estimator for the weight quantization only).

Applied to a parameter tree via ``quantized_gather_tree`` inside the train
step when ``ShardingPolicy.quantized_comms`` is set; arrays whose sharded
bytes are tiny (biases, norms) gather unquantized -- the reference's
persistence-threshold behavior.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
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


# --------------------------------------------------------------- per-device
# custom-VJP body (runs inside shard_map; leading dim = gather dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _gather_rows(shard, axis: str, out_dtype: str, in_dtype: str, quantized_grads: bool):
    """int8 all-gather of a rows-first local shard -> full dequantized array."""
    q, scale = _quantize_rows(shard)
    q_full = lax.all_gather(q, axis, tiled=True)
    s_full = lax.all_gather(scale, axis, tiled=True)
    return _dequantize_rows(q_full, s_full, jnp.dtype(out_dtype))


def _gather_rows_fwd(shard, axis, out_dtype, in_dtype, quantized_grads):
    return _gather_rows(shard, axis, out_dtype, in_dtype, quantized_grads), None


def _gather_rows_bwd(axis, out_dtype, in_dtype, quantized_grads, res, g):
    del res
    in_dtype = jnp.dtype(in_dtype)
    if not quantized_grads:
        # Exact reduce-scatter of the partial cotangents (straight-through
        # wrt the forward weight quantization).
        return (lax.psum_scatter(g, axis, scatter_dimension=0, tiled=True).astype(in_dtype),)

    n = lax.psum(1, axis)  # static axis size
    rows = g.shape[0]
    local_rows = rows // n
    # Chunk the full-size partial gradient by destination device and
    # quantize each row of each chunk independently.
    g3 = g.reshape(n, local_rows, -1)
    absmax = jnp.max(jnp.abs(g3.astype(jnp.float32)), axis=2, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(g3.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    # One int8 all_to_all: device d receives every device's chunk d.
    q_recv = lax.all_to_all(q, axis, split_axis=0, concat_axis=0, tiled=True)
    s_recv = lax.all_to_all(scale, axis, split_axis=0, concat_axis=0, tiled=True)
    summed = jnp.sum(q_recv.astype(jnp.float32) * s_recv, axis=0)
    return (summed.reshape((local_rows,) + g.shape[1:]).astype(in_dtype),)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


# --------------------------------------------------------------------- API


def quantized_all_gather(
    x_sharded: jax.Array,
    mesh: Mesh,
    spec: P,
    out_dtype=None,
    axis: str = AXIS_DATA,
    quantized_grads: bool = False,
):
    """All-gather a data-axis-sharded array as int8 + scales.

    ``spec`` is the array's partition spec (exactly one dim sharded on
    ``axis``); returns the replicated (on that axis) dequantized array.
    Differentiable: the VJP reduce-scatters the cotangent back to the local
    shard -- in int8 (via ``all_to_all`` on the pre-reduction partials) when
    ``quantized_grads`` is set, exactly otherwise.
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
        full = _gather_rows(moved, axis, jnp.dtype(out_dtype).name, moved.dtype.name, quantized_grads)
        return jnp.moveaxis(full, 0, dim)

    out_spec = P(*[None if s == axis else s for s in spec])
    # check_vma=False: inputs replicated over the unused replica/model axes
    # can't be statically proven replicated by shard_map's rep-checker
    return shard_map(local_fn, mesh=mesh, in_specs=(spec,), out_specs=out_spec, check_vma=False)(x_sharded)


def quantized_gather_tree(
    params,
    shardings,
    mesh: Mesh,
    out_dtype=None,
    min_bytes: int = 1 << 16,
    quantized_grads: bool = False,
):
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
        return quantized_all_gather(x, mesh, spec, out_dtype=out_dtype, quantized_grads=quantized_grads)

    return jax.tree.map(gather_leaf, params, shardings)
