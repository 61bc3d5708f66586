"""Pallas TPU kernel for the Mamba selective scan (forward).

The CUDA mamba-ssm kernel exists because materializing the discretized
transition tensors a, b = f(delta, A, B, u) costs O(L * d_inner * d_state)
HBM (~1.3 GB/example for mamba-2.8b). This kernel fuses discretization into
the recurrence: the state h [block_I, N] lives in VMEM scratch and persists
across sequential grid steps over L-chunks (TPU grids execute in order), so
HBM traffic is just the O(L * d_inner) inputs/outputs.

Grid: (batch, I-blocks, L-chunks); L innermost. h_scratch re-initializes at
chunk 0 and carries across chunks of the same (batch, I-block).

Backward: ``selective_scan_fused`` wires this forward into a custom VJP
whose backward evaluates the XLA chunked scan's VJP (recompute-based, memory
bounded by chunking + checkpoint in ``selective_scan.py``). A fully fused
Pallas backward (reverse-time scan) is the next optimization step.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_I = 512
DEFAULT_BLOCK_L = 256


def _scan_kernel(delta_ref, u_ref, B_ref, C_ref, A_ref, y_ref, h_ref, *, block_l, n_state):
    # delta/u: [1, block_l, block_I]; B/C: [1, block_l, N_pad]; A: [block_I, N_pad]
    # h scratch: [block_I, N_pad] f32; y out: [1, block_l, block_I]
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    A = A_ref[...].astype(jnp.float32)  # [block_I, N]

    def step(t, h):
        delta_t = delta_ref[0, pl.ds(t, 1), :].astype(jnp.float32)  # [1, block_I]
        u_t = u_ref[0, pl.ds(t, 1), :].astype(jnp.float32)  # [1, block_I]
        B_t = B_ref[0, pl.ds(t, 1), :].astype(jnp.float32)  # [1, N]
        C_t = C_ref[0, pl.ds(t, 1), :].astype(jnp.float32)  # [1, N]
        da = jnp.exp(delta_t.T * A)  # [block_I, N]
        db = (delta_t * u_t).T * B_t  # [block_I, N]
        h = da * h + db
        y_t = jnp.sum(h * C_t, axis=1)  # [block_I]
        y_ref[0, pl.ds(t, 1), :] = y_t[None, :].astype(y_ref.dtype)
        return h

    h = jax.lax.fori_loop(0, block_l, step, h_ref[...])
    h_ref[...] = h


def selective_scan_pallas_fwd(
    u: jax.Array,  # [B, L, I]
    delta: jax.Array,  # [B, L, I]
    A: jax.Array,  # [I, N]
    B: jax.Array,  # [B, L, N]
    C: jax.Array,  # [B, L, N]
    D: jax.Array,  # [I]
    *,
    block_i: int = DEFAULT_BLOCK_I,
    block_l: int = DEFAULT_BLOCK_L,
) -> jax.Array:
    bsz, L, I = u.shape
    N = A.shape[1]
    block_i = min(block_i, I)
    block_l = min(block_l, L)

    out_dtype = u.dtype
    # f32 streams: discretization is fp32 math anyway, and Mosaic requires
    # sublane-aligned dynamic indices for sub-fp32 tiles (the per-timestep
    # pl.ds slice is stride-1)
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)

    # pad L to a chunk multiple; padded delta=0 => identity transitions
    pad_l = (-L) % block_l
    if pad_l:
        u = jnp.pad(u, ((0, 0), (0, pad_l), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad_l), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad_l), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad_l), (0, 0)))
    # pad N (tiny) to lane width for clean tiling
    n_pad = (-N) % 128
    if n_pad:
        A = jnp.pad(A, ((0, 0), (0, n_pad)))
        B = jnp.pad(B, ((0, 0), (0, 0), (0, n_pad)))
        C = jnp.pad(C, ((0, 0), (0, 0), (0, n_pad)))
    Lp = u.shape[1]
    Np = A.shape[1]

    grid = (bsz, I // block_i, Lp // block_l)
    y = pl.pallas_call(
        functools.partial(_scan_kernel, block_l=block_l, n_state=Np),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, block_i), lambda b, i, l: (b, l, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, block_i), lambda b, i, l: (b, l, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, Np), lambda b, i, l: (b, l, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, Np), lambda b, i, l: (b, l, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, Np), lambda b, i, l: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_l, block_i), lambda b, i, l: (b, l, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, Lp, I), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_i, Np), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(delta, u, B, C, A)

    y = y[:, :L]
    return (y + D.astype(jnp.float32) * u[:, :L]).astype(out_dtype)


@jax.custom_vjp
def selective_scan_fused(u, delta, A, B, C, D):
    return selective_scan_pallas_fwd(u, delta, A, B, C, D)


def _fused_fwd(u, delta, A, B, C, D):
    return selective_scan_pallas_fwd(u, delta, A, B, C, D), (u, delta, A, B, C, D)


def _fused_bwd(res, g):
    from .selective_scan import selective_scan_xla

    u, delta, A, B, C, D = res
    _, vjp = jax.vjp(lambda *a: selective_scan_xla(*a, use_custom_kernels=True), u, delta, A, B, C, D)
    return vjp(g)


selective_scan_fused.defvjp(_fused_fwd, _fused_bwd)
