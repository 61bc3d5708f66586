"""Pallas TPU kernels for the Mamba selective scan (forward + backward).

The CUDA mamba-ssm kernel exists because materializing the discretized
transition tensors a, b = f(delta, A, B, u) costs O(L * d_inner * d_state)
HBM (~1.3 GB/example for mamba-2.8b). These kernels fuse discretization
into the recurrence: the state h lives in VMEM scratch and persists across
sequential grid steps over L-chunks (TPU grids execute in order), so HBM
traffic is just the O(L * d_inner) inputs/outputs.

Layout: the state is [N_state (sublanes), block_i (lanes)] -- N rides the
sublane dimension padded to 8, NOT the 128-wide lane dimension, so the VPU
does no padding work (8x saving at N=16 vs a lane-padded state). Time steps
process in sublane-aligned groups of 8 with the in-group loop statically
unrolled: every per-step slice is static, so Mosaic never emits dynamic
sublane shifts in the hot loop; per-group B/C tiles are transposed once to
[N, 8] to serve per-step broadcast columns.

Grid: (batch, I-blocks, L-chunks); L innermost. h scratch re-initializes at
chunk 0 and carries across chunks of the same (batch, I-block).

Backward: fully fused reverse-time scan (``_scan_bwd_kernel``), mirroring
the fwd+bwd CUDA pair the reference installs via the mamba-ssm wheel
(``/root/reference/pyproject.toml:33-37``). The forward checkpoints the
carried state once per L-chunk (tiny: [N, I] per chunk); the backward walks
chunks in reverse, recomputes in-chunk states from the checkpoint in two
levels (8-step-group entry states, then per-step states, both VMEM-only),
and accumulates all five input cotangents in one pass -- the discretized
[L, I, N] tensors never touch HBM in either direction.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_I = 512
DEFAULT_BLOCK_L = 256
GROUP = 8  # time steps per unrolled group == one f32 sublane tile


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _scan_kernel(delta_ref, u_ref, B_ref, C_ref, AT_ref, y_ref, *rest, block_l):
    # delta/u: [1, block_l, block_i]; B/C: [1, block_l, Np]; AT: [Np, block_i]
    # h scratch: [Np, block_i] f32; y out: [1, block_l, block_i]
    # optional second output (checkpoint variant): ckpt [1, 1, Np, block_i]
    ckpt_ref, h_ref = rest if len(rest) == 2 else (None, rest[0])
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    if ckpt_ref is not None:
        # state entering this chunk -- the backward's recompute seed
        ckpt_ref[0, 0] = h_ref[...]

    AT = AT_ref[...]  # [Np, block_i] (f32 streams)

    def group(g, h):
        base = g * GROUP
        Dg = delta_ref[0, pl.ds(base, GROUP), :]  # [8, block_i]
        Wg = Dg * u_ref[0, pl.ds(base, GROUP), :]
        BgT = jnp.swapaxes(B_ref[0, pl.ds(base, GROUP), :], 0, 1)  # [Np, 8]
        CgT = jnp.swapaxes(C_ref[0, pl.ds(base, GROUP), :], 0, 1)
        da_g = jnp.exp(Dg[:, None, :] * AT[None])  # [8, Np, block_i]
        y_rows = []
        for k in range(GROUP):
            h = da_g[k] * h + BgT[:, k : k + 1] * Wg[k : k + 1, :]
            y_rows.append(jnp.sum(h * CgT[:, k : k + 1], axis=0, keepdims=True))
        y_ref[0, pl.ds(base, GROUP), :] = jnp.concatenate(y_rows, axis=0).astype(y_ref.dtype)
        return h

    h_ref[...] = jax.lax.fori_loop(0, block_l // GROUP, group, h_ref[...])


def _prep(u, delta, A, B, C, block_l):
    """f32 streams; pad L to a block_l multiple, N to a sublane multiple;
    A transposed to the kernel's [N, I] layout."""
    L = u.shape[1]
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    pad_l = (-L) % block_l
    if pad_l:
        # padded delta=0 => identity transitions, zero inputs
        u = jnp.pad(u, ((0, 0), (0, pad_l), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad_l), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad_l), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad_l), (0, 0)))
    n_pad = (-A.shape[1]) % GROUP
    if n_pad:
        A = jnp.pad(A, ((0, 0), (0, n_pad)))
        B = jnp.pad(B, ((0, 0), (0, 0), (0, n_pad)))
        C = jnp.pad(C, ((0, 0), (0, 0), (0, n_pad)))
    return u, delta, A.astype(jnp.float32).T, B, C


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
    with_checkpoints: bool = False,
):
    bsz, L, I = u.shape
    block_i = min(block_i, I)
    block_l = min(block_l, _ceil_to(L, GROUP))

    out_dtype = u.dtype
    u32, delta32, AT32, B32, C32 = _prep(u, delta, A, B, C, block_l)
    Lp = u32.shape[1]
    Np = AT32.shape[0]
    n_lc = Lp // block_l

    grid = (bsz, I // block_i, n_lc)
    in_specs = [
        pl.BlockSpec((1, block_l, block_i), lambda b, i, l: (b, l, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_l, block_i), lambda b, i, l: (b, l, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_l, Np), lambda b, i, l: (b, l, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_l, Np), lambda b, i, l: (b, l, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Np, block_i), lambda b, i, l: (0, i), memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((1, block_l, block_i), lambda b, i, l: (b, l, i), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bsz, Lp, I), jnp.float32)
    if with_checkpoints:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, 1, Np, block_i), lambda b, i, l: (b, l, 0, i), memory_space=pltpu.VMEM),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((bsz, n_lc, Np, I), jnp.float32)]

    res = pl.pallas_call(
        functools.partial(_scan_kernel, block_l=block_l),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((Np, block_i), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(delta32, u32, B32, C32, AT32)

    y, ckpt = res if with_checkpoints else (res, None)
    y = y[:, :L]
    y = (y + D.astype(jnp.float32) * u32[:, :L]).astype(out_dtype)
    return (y, ckpt) if with_checkpoints else y


# --------------------------------------------------------------- backward

def _scan_bwd_kernel(
    delta_ref, u_ref, B_ref, C_ref, AT_ref, dy_ref, h0_ref,
    ddelta_ref, du_ref, dB_ref, dC_ref, dA_ref,
    G_ref, hmid_ref,
    *, block_l,
):
    """One reverse-order L-chunk of the selective-scan VJP.

    Refs per grid step (b, i-block, reversed l-chunk):
      inputs   delta/u/dy [1, block_l, block_i]; B/C [1, block_l, Np];
               AT [Np, block_i]; h0 (chunk-entry checkpoint) [1, 1, Np, block_i]
      outputs  ddelta/du rows; dB/dC rows (partial over i-blocks);
               dA [1, Np, block_i] (accumulated over l, partial over batch)
      scratch  G: carried da_{t+1} * gh_{t+1} across chunks/groups;
               hmid: 8-step-group entry states (recomputed pass 1, VMEM-only).
    """
    li = pl.program_id(2)  # 0 == LAST chunk (index maps reverse l)
    n_groups = block_l // GROUP

    @pl.when(li == 0)
    def _():
        G_ref[...] = jnp.zeros_like(G_ref)
        dA_ref[...] = jnp.zeros_like(dA_ref)

    AT = AT_ref[...]  # [Np, block_i]

    def load_group(base):
        Dg = delta_ref[0, pl.ds(base, GROUP), :]  # [8, block_i]
        Wg = Dg * u_ref[0, pl.ds(base, GROUP), :]
        BgT = jnp.swapaxes(B_ref[0, pl.ds(base, GROUP), :], 0, 1)  # [Np, 8]
        da_g = jnp.exp(Dg[:, None, :] * AT[None])  # [8, Np, block_i]
        return Dg, Wg, BgT, da_g

    # ---- pass 1: forward recompute from the chunk checkpoint, storing each
    # 8-step group's entry state
    def fwd_group(g, h):
        hmid_ref[pl.ds(g, 1)] = h[None]
        _, Wg, BgT, da_g = load_group(g * GROUP)
        for k in range(GROUP):
            h = da_g[k] * h + BgT[:, k : k + 1] * Wg[k : k + 1, :]
        return h

    jax.lax.fori_loop(0, n_groups, fwd_group, h0_ref[0, 0].astype(jnp.float32))

    # ---- pass 2: reverse over groups; recompute the 8 in-group states, then
    # walk the group backwards accumulating all cotangents
    def bwd_group(kg, _):
        g = n_groups - 1 - kg
        base = g * GROUP
        Dg, Wg, BgT, da_g = load_group(base)
        CgT = jnp.swapaxes(C_ref[0, pl.ds(base, GROUP), :], 0, 1)  # [Np, 8]
        DYg = dy_ref[0, pl.ds(base, GROUP), :]  # [8, block_i]
        Ug = u_ref[0, pl.ds(base, GROUP), :]

        h = hmid_ref[pl.ds(g, 1)][0]
        h_entry = h
        hs = []
        for k in range(GROUP):
            h = da_g[k] * h + BgT[:, k : k + 1] * Wg[k : k + 1, :]
            hs.append(h)
        HS = jnp.stack(hs)  # [8, Np, block_i]
        # dC_t[n] = sum_i dy_t[i] h_t[n,i] (partial over i-blocks)
        dC_g = jnp.sum(HS * DYg[:, None, :], axis=2)  # [8, Np]

        G = G_ref[...]
        dA_acc = jnp.zeros_like(AT)
        ddelta_rows = [None] * GROUP
        du_rows = [None] * GROUP
        ghs = [None] * GROUP
        for k in range(GROUP - 1, -1, -1):
            gh = CgT[:, k : k + 1] * DYg[k : k + 1, :] + G  # [Np, block_i]
            ghs[k] = gh
            h_prev = hs[k - 1] if k > 0 else h_entry
            common = gh * h_prev * da_g[k]
            dA_acc = dA_acc + common * Dg[k : k + 1, :]
            ghB = jnp.sum(gh * BgT[:, k : k + 1], axis=0, keepdims=True)  # [1, block_i]
            ddelta_rows[k] = jnp.sum(common * AT, axis=0, keepdims=True) + ghB * Ug[k : k + 1, :]
            du_rows[k] = ghB * Dg[k : k + 1, :]
            G = da_g[k] * gh
        G_ref[...] = G
        dA_ref[0] += dA_acc
        # dB_t[n] = sum_i gh_t[n,i] (delta*u)_t[i] (partial over i-blocks)
        dB_g = jnp.sum(jnp.stack(ghs) * Wg[:, None, :], axis=2)  # [8, Np]

        ddelta_ref[0, pl.ds(base, GROUP), :] = jnp.concatenate(ddelta_rows, axis=0)
        du_ref[0, pl.ds(base, GROUP), :] = jnp.concatenate(du_rows, axis=0)
        dB_ref[0, 0, pl.ds(base, GROUP), :] = dB_g
        dC_ref[0, 0, pl.ds(base, GROUP), :] = dC_g
        return 0

    jax.lax.fori_loop(0, n_groups, bwd_group, 0)


def selective_scan_pallas_bwd(
    u, delta, A, B, C, dy, h_ckpt,
    *,
    block_i: int = DEFAULT_BLOCK_I,
    block_l: int = DEFAULT_BLOCK_L,
):
    """Cotangents (du, ddelta, dA, dB, dC) of the scan output y (pre-D skip).

    ``h_ckpt`` is the forward's per-chunk state checkpoint [B, n_lc, Np, I]
    (built with the same ``block_l``).
    """
    bsz, L, I = u.shape
    N = A.shape[1]
    block_i = min(block_i, I)
    block_l = min(block_l, _ceil_to(L, GROUP))

    u32, delta32, AT32, B32, C32 = _prep(u, delta, A, B, C, block_l)
    dy32 = dy.astype(jnp.float32)
    if u32.shape[1] != L:
        dy32 = jnp.pad(dy32, ((0, 0), (0, u32.shape[1] - L), (0, 0)))
    Lp = u32.shape[1]
    Np = AT32.shape[0]
    n_lc = Lp // block_l
    n_ib = I // block_i

    grid = (bsz, n_ib, n_lc)
    rev = lambda l: n_lc - 1 - l  # noqa: E731

    bi_spec = pl.BlockSpec((1, block_l, block_i), lambda b, i, l: (b, rev(l), i), memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((1, block_l, Np), lambda b, i, l: (b, rev(l), 0), memory_space=pltpu.VMEM)
    ddelta, du, dB_part, dC_part, dA_part = pl.pallas_call(
        functools.partial(_scan_bwd_kernel, block_l=block_l),
        grid=grid,
        in_specs=[
            bi_spec,  # delta
            bi_spec,  # u
            n_spec,  # B
            n_spec,  # C
            pl.BlockSpec((Np, block_i), lambda b, i, l: (0, i), memory_space=pltpu.VMEM),  # AT
            bi_spec,  # dy
            pl.BlockSpec((1, 1, Np, block_i), lambda b, i, l: (b, rev(l), 0, i), memory_space=pltpu.VMEM),  # h0
        ],
        out_specs=[
            bi_spec,  # ddelta
            bi_spec,  # du
            pl.BlockSpec((1, 1, block_l, Np), lambda b, i, l: (i, b, rev(l), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_l, Np), lambda b, i, l: (i, b, rev(l), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, block_i), lambda b, i, l: (b, 0, i), memory_space=pltpu.VMEM),  # dA
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, Lp, I), jnp.float32),
            jax.ShapeDtypeStruct((bsz, Lp, I), jnp.float32),
            jax.ShapeDtypeStruct((n_ib, bsz, Lp, Np), jnp.float32),
            jax.ShapeDtypeStruct((n_ib, bsz, Lp, Np), jnp.float32),
            jax.ShapeDtypeStruct((bsz, Np, I), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Np, block_i), jnp.float32),  # G (reverse carry)
            pltpu.VMEM((block_l // GROUP, Np, block_i), jnp.float32),  # hmid
        ],
        interpret=jax.default_backend() != "tpu",
    )(delta32, u32, B32, C32, AT32, dy32, h_ckpt)

    du = du[:, :L]
    ddelta = ddelta[:, :L]
    dA = jnp.sum(dA_part, axis=0).T[:, :N]  # over batch; back to [I, N]; unpad
    dB = jnp.sum(dB_part, axis=0)[:, :L, :N]  # over i-blocks
    dC = jnp.sum(dC_part, axis=0)[:, :L, :N]
    return du, ddelta, dA, dB, dC


@jax.custom_vjp
def selective_scan_fused(u, delta, A, B, C, D):
    return selective_scan_pallas_fwd(u, delta, A, B, C, D)


def _fused_fwd(u, delta, A, B, C, D):
    y, ckpt = selective_scan_pallas_fwd(u, delta, A, B, C, D, with_checkpoints=True)
    return y, (u, delta, A, B, C, D, ckpt)


def _fused_bwd(res, g):
    u, delta, A, B, C, D, ckpt = res
    g32 = g.astype(jnp.float32)
    du, ddelta, dA, dB, dC = selective_scan_pallas_bwd(u, delta, A, B, C, g32, ckpt)
    # y = scan(u, ...) + D * u: the skip contributes to du and carries dD
    du = du + D.astype(jnp.float32) * g32
    dD = jnp.sum(g32 * u.astype(jnp.float32), axis=(0, 1))
    return (
        du.astype(u.dtype),
        ddelta.astype(delta.dtype),
        dA.astype(A.dtype),
        dB.astype(B.dtype),
        dC.astype(C.dtype),
        dD.astype(D.dtype),
    )


selective_scan_fused.defvjp(_fused_fwd, _fused_bwd)
