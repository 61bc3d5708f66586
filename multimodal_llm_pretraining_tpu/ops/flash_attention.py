"""Blockwise flash attention as a Pallas TPU kernel (fwd + custom-VJP bwd).

This is the free-lunch / custom-kernel attention path, replacing the
reference's delegation to torch SDPA / fused CUDA attention
(``src/models/pythia.py:18-21``, ``src/models/vit.py:15``). Online-softmax
forward; backward recomputes probabilities from the saved logsumexp (no
O(S^2) residuals), so attention activation memory is O(S*D) per head.

Layout: [batch, heads, seq, head_dim]; batch*heads folds into the first grid
axis. Sequences are padded to the block size and masked exactly in-kernel
(bounds + causal). Rectangular (cross-)attention works; [B, Sk] padding
keep-masks run in-kernel as per-row kv lengths (``_flash_varlen``), so
padded multimodal batches (LLaVA seq 1087) stay on the flash path instead
of materializing O(S^2) bias tensors. Arbitrary additive biases fall back
to the XLA path (see ``ops/attention.py``).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30
LANES = 8  # per-row stats (lse/delta) carry a small broadcast trailing dim:
# Mosaic requires a block's last dim to be 128-divisible OR equal to the
# array's dim, so making the whole trailing dim 8 keeps tiling legal while
# cutting the stat arrays' HBM traffic 16x vs broadcasting to lane width.


def flash_supported(q, k, v, mask) -> bool:
    """The kernel handles [B,H,S,D] with full (None) masks or [B,Sk] padding
    masks (prefix-contiguous keep-masks -- what every collator in this repo
    produces; the kernel reduces them to per-row kv lengths). Irregular
    biases and oversized head dims go to the XLA path."""
    if not (q.ndim == 4 and k.ndim == 4 and v.ndim == 4 and q.shape[-1] <= 512):
        return False
    return mask is None or (mask.ndim == 2 and mask.shape[0] == q.shape[0] and mask.shape[1] == k.shape[2])


def _cdiv(a, b):
    """ceil-div that stays a Python int for Python ints (so static loop
    bounds keep unrolling) and traces for dynamic kv lengths."""
    return (a + b - 1) // b


def _auto_block(seq: int, default: int) -> int:
    """Block size for one grid axis: the largest of {default, default/2, ...,
    128} whose padding waste stays under 1/8 of the padded length; if none
    qualifies (short/awkward lengths), the block minimizing the padded
    length wins, ties to the larger block.

    Padded tile work is quadratic in the per-axis waste, and it bites on
    encoder sequences: ViT-L runs S=577, which block 512 pads to 1024 (3.1x
    the score-tile area) while block 128 pads to 640 (1.23x). Exact-fit
    sequences (pythia 2048, roberta 512) keep the 512 default, so the
    causal-LM production step is unchanged."""
    candidates = []
    b = default
    while b >= 128:
        candidates.append(b)
        b //= 2
    for b in candidates:  # largest first
        padded = -(-seq // b) * b
        if padded - seq <= padded // 8:
            return b
    return min(candidates, key=lambda b: ((-(-seq // b)) * b, -b))


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------- forward


def _fwd_kernel(*refs, sm_scale, causal, block_k, kv_seq, varlen=False):
    # q_ref: [1, block_q, D]; k_ref/v_ref: [1, kv_pad, D]
    # sm_scale is folded into q once (one [block_q, D] mul) rather than into
    # every [block_q, block_k] score block: the softmax is VPU-bound at small
    # head dims, so each saved elementwise pass over the scores matters.
    # varlen: the SMEM [bh,1] kv-length column leads the refs (indexed by
    # batch-head program id); every static kv bound below becomes that
    # dynamic value (loop bounds turn into while-loops -- only the
    # masked-arm path pays, full interior blocks still skip mask work).
    if varlen:
        lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref = refs
        kv_len = lens_ref[pl.program_id(0), 0]
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
        kv_len = kv_seq
    _, block_q, head_dim = q_ref.shape
    qi = pl.program_id(1)
    q_start = qi * block_q

    q = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    in_dtype = q.dtype
    num_kb = _cdiv(kv_len, block_k)

    def body(kb, carry, masked):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        # bf16 x bf16 -> f32 accumulation: native MXU path
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)

        if masked:
            k_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = k_idx < kv_len
            if causal:
                q_idx = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                mask = jnp.logical_and(mask, q_idx >= k_idx)
            s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_i - m_new)
        l_i = l_i * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot(p.astype(in_dtype), v_blk, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        return acc, m_new, l_i

    if causal:
        # key blocks strictly above this q block's diagonal contribute nothing
        num_kb_eff = jnp.minimum(num_kb, _cdiv(q_start + block_q, block_k))
    else:
        num_kb_eff = num_kb
    # blocks needing no mask work: fully below the diagonal AND within bounds.
    # q_start is multiple_of(block_q); interior count is exact, not a bound.
    num_kb_full = jnp.minimum(q_start // block_k, kv_len // block_k) if causal else kv_len // block_k

    acc = jnp.zeros((block_q, head_dim), jnp.float32)
    m_i = jnp.full((block_q,), NEG_INF, jnp.float32)
    l_i = jnp.zeros((block_q,), jnp.float32)
    carry = (acc, m_i, l_i)
    carry = jax.lax.fori_loop(0, num_kb_full, functools.partial(body, masked=False), carry)
    acc, m_i, l_i = jax.lax.fori_loop(num_kb_full, num_kb_eff, functools.partial(body, masked=True), carry)

    l_safe = jnp.where(l_i > 0, l_i, 1.0)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse = m_i + jnp.log(l_safe)
    lse_ref[0] = jnp.broadcast_to(lse[:, None], (block_q, LANES))


# ---------------------------------------------------------------- backward


def _bwd_dq_kernel(*refs, sm_scale, causal, block_k, kv_seq, varlen=False):
    if varlen:
        lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
        kv_len = lens_ref[pl.program_id(0), 0]
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
        kv_len = kv_seq
    _, block_q, head_dim = q_ref.shape
    qi = pl.program_id(1)
    q_start = qi * block_q

    # scale folds into q (only used for scores here); ds carries sm_scale for
    # the dq matmul against *unscaled* k
    q = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    in_dtype = q.dtype
    do = do_ref[0]
    lse = lse_ref[0, :, 0]
    delta = delta_ref[0, :, 0]
    num_kb = _cdiv(kv_len, block_k)

    def body(kb, dq, masked):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        if masked:
            k_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = k_idx < kv_len
            if causal:
                q_idx = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                mask = jnp.logical_and(mask, q_idx >= k_idx)
            s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        ds = (p * (dp - delta[:, None]) * sm_scale).astype(in_dtype)
        return dq + jax.lax.dot(ds, k_blk, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)

    if causal:
        num_kb_eff = jnp.minimum(num_kb, _cdiv(q_start + block_q, block_k))
    else:
        num_kb_eff = num_kb
    num_kb_full = jnp.minimum(q_start // block_k, kv_len // block_k) if causal else kv_len // block_k
    dq = jnp.zeros((block_q, head_dim), jnp.float32)
    dq = jax.lax.fori_loop(0, num_kb_full, functools.partial(body, masked=False), dq)
    dq = jax.lax.fori_loop(num_kb_full, num_kb_eff, functools.partial(body, masked=True), dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_fused_kernel(
    *refs, sm_scale, causal, block_q, q_seq, kv_seq, varlen=False, dp_early=False,
):
    """Single-pass backward: dq, dk, dv from ONE score/probability tile.

    The split dq/dkv kernels each recompute s and dp, costing 7 matmul
    passes over the S x S tile space; computing all three grads per tile
    needs only 5 (s, dp, dv, dk, dq). TPU Pallas grids execute
    sequentially, so dq -- indexed by q block, which varies INSIDE the
    program -- lives as a whole-sequence f32 output block whose index map
    ignores the k-grid axis: the block stays resident in VMEM across all k
    programs of one batch-head (revisiting), accumulating ds @ k
    contributions, and flushes once when the bh index advances.
    """
    if varlen:
        lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dk_ref, dv_ref = refs
        kv_len = lens_ref[pl.program_id(0), 0]
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dk_ref, dv_ref = refs
        kv_len = kv_seq
    _, block_k, head_dim = k_ref.shape
    ki = pl.program_id(1)
    k_start = ki * block_k

    @pl.when(ki == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    k_blk = k_ref[0]
    v_blk = v_ref[0]
    in_dtype = k_blk.dtype
    # scale folds into k (scores only): q must stay unscaled for dk = ds^T @ q
    # and dq = ds @ k (ds already carries sm_scale)
    k_scaled = (k_blk.astype(jnp.float32) * sm_scale).astype(in_dtype)
    k_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    kv_keep = k_idx < kv_len
    num_qb = pl.cdiv(q_seq, block_q)

    def body(qi, carry, masked):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]
        do = do_ref[0, pl.ds(qi * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(qi * block_q, block_q), 0]
        delta = delta_ref[0, pl.ds(qi * block_q, block_q), 0]
        s = jax.lax.dot_general(q, k_scaled, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        if dp_early:
            # dp depends only on do/v -- issuing its (MXU) matmul before the
            # (VPU) exp chain below gives the scheduler a shot at overlapping
            # the two units instead of serializing s -> exp -> dv -> dp
            dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        if masked:
            q_idx = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(kv_keep, q_idx < q_seq)
            if causal:
                mask = jnp.logical_and(mask, q_idx >= k_idx)
            s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])
        dv = dv + jax.lax.dot_general(p.astype(in_dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        if not dp_early:
            dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        ds = (p * (dp - delta[:, None]) * sm_scale).astype(in_dtype)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        qs = pl.ds(qi * block_q, block_q)
        dq_ref[0, qs, :] += jax.lax.dot(ds, k_blk, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        return dk, dv

    # Loop split mirrors _bwd_dkv_kernel: diagonal-straddling q blocks take
    # the causal mask, interior blocks skip mask work, the q-padding tail
    # takes the bounds mask; a k block past kv_seq masks every iteration.
    qb_start = k_start // block_q if causal else 0
    diag_end = pl.cdiv(k_start + block_k, block_q) if causal else qb_start
    diag_end = jnp.minimum(diag_end, num_qb)
    kv_full = (k_start + block_k) <= kv_len
    full_hi = jnp.where(kv_full, jnp.maximum(diag_end, q_seq // block_q), diag_end)

    dk = jnp.zeros((block_k, head_dim), jnp.float32)
    dv = jnp.zeros((block_k, head_dim), jnp.float32)
    carry = (dk, dv)
    carry = jax.lax.fori_loop(qb_start, diag_end, functools.partial(body, masked=True), carry)
    carry = jax.lax.fori_loop(diag_end, full_hi, functools.partial(body, masked=False), carry)
    dk, dv = jax.lax.fori_loop(full_hi, num_qb, functools.partial(body, masked=True), carry)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dkv_kernel(*refs, sm_scale, causal, block_q, q_seq, kv_seq, varlen=False):
    if varlen:
        lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref = refs
        kv_len = lens_ref[pl.program_id(0), 0]
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref = refs
        kv_len = kv_seq
    _, block_k, head_dim = k_ref.shape
    ki = pl.program_id(1)
    k_start = ki * block_k

    k_blk = k_ref[0]
    v_blk = v_ref[0]
    in_dtype = k_blk.dtype
    # scale folds into k (only used for scores here): q must stay unscaled for
    # the dk = ds^T @ q matmul (ds already carries sm_scale)
    k_scaled = (k_blk.astype(jnp.float32) * sm_scale).astype(in_dtype)
    k_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    kv_keep = k_idx < kv_len
    num_qb = pl.cdiv(q_seq, block_q)

    def body(qi, carry, masked):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]
        do = do_ref[0, pl.ds(qi * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(qi * block_q, block_q), 0]
        delta = delta_ref[0, pl.ds(qi * block_q, block_q), 0]
        s = jax.lax.dot_general(q, k_scaled, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        if masked:
            q_idx = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(kv_keep, q_idx < q_seq)
            if causal:
                mask = jnp.logical_and(mask, q_idx >= k_idx)
            s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])
        dv = dv + jax.lax.dot_general(p.astype(in_dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        ds = (p * (dp - delta[:, None]) * sm_scale).astype(in_dtype)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        return dk, dv

    # Loop split: diagonal-straddling q blocks take the causal mask, interior
    # blocks skip mask work entirely, the q-padding tail takes the bounds
    # mask. A k block extending past kv_seq masks every iteration (empty full
    # range).
    qb_start = k_start // block_q if causal else 0
    diag_end = pl.cdiv(k_start + block_k, block_q) if causal else qb_start
    diag_end = jnp.minimum(diag_end, num_qb)
    kv_full = (k_start + block_k) <= kv_len
    full_hi = jnp.where(kv_full, jnp.maximum(diag_end, q_seq // block_q), diag_end)

    dk = jnp.zeros((block_k, head_dim), jnp.float32)
    dv = jnp.zeros((block_k, head_dim), jnp.float32)
    carry = (dk, dv)
    carry = jax.lax.fori_loop(qb_start, diag_end, functools.partial(body, masked=True), carry)
    carry = jax.lax.fori_loop(diag_end, full_hi, functools.partial(body, masked=False), carry)
    dk, dv = jax.lax.fori_loop(full_hi, num_qb, functools.partial(body, masked=True), carry)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------- plumbing


def _lens_spec(bh):
    """SMEM spec for the per-batch-head kv-length column ([bh, 1] int32).
    Mosaic requires sublane-dim blocks divisible by 8 or whole-array: the
    whole (tiny) column rides along and kernels index it by program id."""
    return pl.BlockSpec((bh, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM)


def _fwd_impl(q, k, v, causal, sm_scale, block_q, block_k, kv_lens=None):
    bh, q_seq, head_dim = q.shape
    kv_seq = k.shape[1]
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    q_pad, kv_pad = qp.shape[1], kp.shape[1]
    varlen = kv_lens is not None

    in_specs = [
        pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kv_pad, head_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kv_pad, head_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = (qp, kp, vp)
    if varlen:
        in_specs = [_lens_spec(bh)] + in_specs
        inputs = (kv_lens,) + inputs

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, causal=causal, block_k=block_k, kv_seq=kv_seq, varlen=varlen),
        grid=(bh, q_pad // block_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, q_pad, head_dim), q.dtype),
            jax.ShapeDtypeStruct((bh, q_pad, LANES), jnp.float32),
        ],
        interpret=_interpret(),
    )(*inputs)
    return out[:, :q_seq], lse[:, :q_seq, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, causal, sm_scale, block_q, block_k):
    out, _ = _fwd_impl(q, k, v, causal, sm_scale, block_q, block_k)
    return out


def _flash_fwd_rule(q, k, v, causal, sm_scale, block_q, block_k):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _fwd_impl(q, k, v, causal, sm_scale, block_q, block_k)
    # named so remat policies can keep the attention residuals (out is
    # [BH,S,D] bf16, lse [BH,S] f32 -- tiny next to recomputing the kernel);
    # see models.layers.make_stack's default policy
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


# Mosaic's default scoped-VMEM budget is 16 MiB, but the physical VMEM on
# current chips is far larger (probed >=60 MiB usable on v5e; v4/v5p/v6e
# carry 128 MiB); kernels whose working set exceeds the default ask for more
# via CompilerParams(vmem_limit_bytes=...). Staying well under physical
# capacity keeps headroom for the pipeline's input/output double buffers.
# v2/v3 physically have 16 MiB, where a 56 MiB grant would fail compilation:
# the cap follows the detected generation (conservative default elsewhere).
_VMEM_CAP_BY_GEN = {"v4": 56 * 2**20, "v5e": 56 * 2**20, "v5p": 56 * 2**20, "v6e": 56 * 2**20}
_VMEM_CAP_DEFAULT = 16 * 2**20


@functools.cache
def _vmem_cap() -> int:
    override = os.environ.get("MLPT_FLASH_VMEM_CAP_MB")
    if override:
        return int(override) * 2**20
    from ..tpus import detect_local_tpu

    if _interpret():
        return 56 * 2**20  # interpret mode: the grant never reaches Mosaic
    return _VMEM_CAP_BY_GEN.get(detect_local_tpu(), _VMEM_CAP_DEFAULT)

# Gate between the fused single-pass backward (dq+dk+dv from one score
# tile, 5 matmul passes vs the split kernels' 7) and the split dq/dkv
# kernels. The two rank DIFFERENTLY in isolation vs in a training step on
# v5e (2026-08-18, quiet host): standalone attention-only loops favor
# split at every head_dim (fwd+bwd ms/call, split vs fused: D=64 7.18 vs
# 9.47, D=128 5.77 vs 6.72, D=256 5.88 vs 6.46), but inside the pythia-1b
# production step the fused kernel wins ~3.7% end-to-end (acc=4 full step
# 1.96 s vs 2.03 s) -- in-context, the grads pass is HBM-bound and the
# fused kernel's single pass over q/do beats the split kernels' re-reads.
# Default ON (the training-step ranking is the one that matters);
# MLPT_FLASH_FUSED_BWD=0 opts out.
PREFER_FUSED_BWD = os.environ.get("MLPT_FLASH_FUSED_BWD", "1") != "0"

# dp-early scheduling in the fused backward: issue the dp matmul (MXU)
# before the exp chain (VPU) so the two units overlap instead of
# serializing s -> exp -> dv -> dp. Measured 2026-08-19 (quiet v5e, B4 H8
# S2048 D256): standalone fused fwd+bwd 6.31 -> 5.64 ms (-10.6%); in the
# production pythia-1b step (mbs4 acc4, dots remat, bf16_sr) 1.663 ->
# 1.631 s (-1.9%, MFU 0.6261 -> 0.6385) -- wins BOTH rankings, so default
# ON (artifacts/flash_kernel_ab_v5e.json). MLPT_FLASH_DP_EARLY=0 opts out.
#   MLPT_FLASH_BWD_BLOCK_Q=N  A/B-only: inner q-slice length of the fused
#                             backward's loop, decoupled from the forward's
#                             block_q (bq256 won standalone but lost to
#                             dp_early in-step; combination adds nothing)
# Both env gates are read at TRACE time (every _bwd_impl call), so in-process
# A/B runs that set them after import take effect; the module global is the
# programmatic override the sweep script flips directly.
DP_EARLY = os.environ.get("MLPT_FLASH_DP_EARLY", "1") != "0"


def _fused_bwd_est(q_pad, head_dim, block_q, block_k) -> int:
    """Analytic lower bound on the fused kernel's VMEM working set:
    whole-sequence q/do (input dtype) + f32 dq output + per-tile
    score/probability/accumulator buffers. Mosaic's true stack is larger
    (mask iotas, exp temporaries, double-buffered windows, lane-padded
    [.,8] stat blocks): measured x1.86-2.33 over this estimate at
    pythia-1b shapes, hence the x2.5 sizing margin in `_fused_bwd_plan`."""
    whole_rows = q_pad * head_dim * (2 + 2 + 4)  # q bf16 + do bf16 + dq f32
    tiles = block_q * block_k * 4 * 3  # s, p, dp f32
    tiles += block_k * head_dim * (2 * 2 + 2 * 4)  # k, v bf16 + dk, dv f32 acc
    return whole_rows + tiles


def _fused_bwd_plan(q_seq, head_dim, block_q, block_k):
    """(block_q, block_k, vmem_limit_bytes) for the fused backward, or None
    when even shrunken blocks would blow past ``_vmem_cap()`` (-> split
    kernels). Shrinks block_k first: the whole-sequence q/do/dq residency is
    paid either way, while the k/v/dk/dv tile cost scales with block_k."""
    bq, bk = block_q, block_k
    while True:
        q_pad = q_seq + ((-q_seq) % bq)
        need = int(2.5 * _fused_bwd_est(q_pad, head_dim, bq, bk))
        if need <= _vmem_cap():
            return bq, bk, max(need, 16 * 2**20)
        if bk > 128:
            bk //= 2
        elif bq > 128:
            bq //= 2
        else:
            return None


def _bwd_impl(causal, sm_scale, block_q, block_k, q, k, v, out, lse, g, kv_lens=None):
    bh, q_seq, head_dim = q.shape
    kv_seq = k.shape[1]
    varlen = kv_lens is not None

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # [BH, Sq]

    _dp_env = os.environ.get("MLPT_FLASH_DP_EARLY")
    dp_early = (_dp_env != "0") if _dp_env is not None else DP_EARLY
    fused_plan = _fused_bwd_plan(q_seq, head_dim, block_q, block_k) if PREFER_FUSED_BWD else None
    env_bwd_bq = os.environ.get("MLPT_FLASH_BWD_BLOCK_Q")
    if fused_plan is not None and env_bwd_bq:
        # A/B override: pin the fused backward's inner q-slice length
        # independently of the forward block; re-derive the VMEM grant.
        # An override whose working set exceeds the cap falls back to the
        # split kernels (mirroring _fused_bwd_plan) instead of compiling
        # the fused kernel with an undersized grant (Mosaic compile error).
        bq = int(env_bwd_bq)
        q_pad_est = q_seq + ((-q_seq) % bq)
        need = max(int(2.5 * _fused_bwd_est(q_pad_est, head_dim, bq, fused_plan[1])), 16 * 2**20)
        fused_plan = (bq, fused_plan[1], need) if need <= _vmem_cap() else None
    if fused_plan is not None:
        block_q, block_k, vmem_limit = fused_plan

    qp, dop = _pad_to(q, 1, block_q), _pad_to(g, 1, block_q)
    lsep = jnp.broadcast_to(_pad_to(lse, 1, block_q)[..., None], (bh, _pad_to(lse, 1, block_q).shape[1], LANES))
    deltap = jnp.broadcast_to(_pad_to(delta, 1, block_q)[..., None], lsep.shape)
    kp, vp = _pad_to(k, 1, block_k), _pad_to(v, 1, block_k)
    q_pad, kv_pad = qp.shape[1], kp.shape[1]
    lens_in = (kv_lens,) if varlen else ()
    lens_spec = [_lens_spec(bh)] if varlen else []

    if fused_plan is not None:
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q, q_seq=q_seq, kv_seq=kv_seq, varlen=varlen, dp_early=dp_early),
            grid=(bh, kv_pad // block_k),
            in_specs=lens_spec + [
                pl.BlockSpec((1, q_pad, head_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q_pad, head_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q_pad, LANES), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q_pad, LANES), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                # dq's index map ignores the k axis: revisited (VMEM-resident,
                # accumulating) across every k program of one batch-head
                pl.BlockSpec((1, q_pad, head_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, q_pad, head_dim), jnp.float32),
                jax.ShapeDtypeStruct((bh, kv_pad, head_dim), k.dtype),
                jax.ShapeDtypeStruct((bh, kv_pad, head_dim), v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
            interpret=_interpret(),
        )(*lens_in, qp, kp, vp, dop, lsep, deltap)
        return dq[:, :q_seq].astype(q.dtype), dk[:, :kv_seq], dv[:, :kv_seq]

    # Split-kernel fallback (shapes whose whole-sequence residency exceeds
    # scoped VMEM). The dk/dv kernel keeps the whole (padded) q and do
    # resident in VMEM on top of its score/probability tiles; at large head
    # dims that sum crosses the 16 MB scoped-VMEM limit, so its inner q
    # block AND its k block both shrink.
    big_head = head_dim > 128
    block_q_dkv = block_q // 2 if (big_head and block_q >= 256) else block_q
    block_k_dkv = block_k // 2 if (big_head and block_k >= 256) else block_k

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, causal=causal, block_k=block_k, kv_seq=kv_seq, varlen=varlen),
        grid=(bh, q_pad // block_q),
        in_specs=lens_spec + [
            pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, head_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, head_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, head_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_cap()),
        interpret=_interpret(),
    )(*lens_in, qp, kp, vp, dop, lsep, deltap)[:, :q_seq]

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q_dkv, q_seq=q_seq, kv_seq=kv_seq, varlen=varlen),
        grid=(bh, kv_pad // block_k_dkv),
        in_specs=lens_spec + [
            pl.BlockSpec((1, q_pad, head_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k_dkv, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k_dkv, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_pad, head_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_pad, LANES), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_pad, LANES), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k_dkv, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k_dkv, head_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, kv_pad, head_dim), k.dtype),
            jax.ShapeDtypeStruct((bh, kv_pad, head_dim), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_cap()),
        interpret=_interpret(),
    )(*lens_in, qp, kp, vp, dop, lsep, deltap)
    return dq, dk[:, :kv_seq], dv[:, :kv_seq]


def _flash_bwd_rule(causal, sm_scale, block_q, block_k, res, g):
    q, k, v, out, lse = res
    return _bwd_impl(causal, sm_scale, block_q, block_k, q, k, v, out, lse, g)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# Varlen (padded-batch) variant: identical math with per-batch-head kv
# lengths. A SEPARATE custom_vjp so the unmasked kernels' compiled programs
# stay byte-identical (static loop bounds keep unrolling; adding a dynamic
# length would silently re-key every committed measurement).


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_varlen(q, k, v, kv_lens, causal, sm_scale, block_q, block_k):
    out, _ = _fwd_impl(q, k, v, causal, sm_scale, block_q, block_k, kv_lens=kv_lens)
    return out


def _flash_varlen_fwd_rule(q, k, v, kv_lens, causal, sm_scale, block_q, block_k):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _fwd_impl(q, k, v, causal, sm_scale, block_q, block_k, kv_lens=kv_lens)
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, kv_lens, out, lse)


def _flash_varlen_bwd_rule(causal, sm_scale, block_q, block_k, res, g):
    import numpy as np

    q, k, v, kv_lens, out, lse = res
    dq, dk, dv = _bwd_impl(causal, sm_scale, block_q, block_k, q, k, v, out, lse, g, kv_lens=kv_lens)
    # integer input: float0 cotangent
    return dq, dk, dv, np.zeros(kv_lens.shape, jax.dtypes.float0)


_flash_varlen.defvjp(_flash_varlen_fwd_rule, _flash_varlen_bwd_rule)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    kv_len_mask: jax.Array | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
) -> jax.Array:
    """Flash attention over [B, H, S, D].

    ``kv_len_mask`` is a [B, Sk] keep-mask (1 = attend). It MUST be
    prefix-contiguous (right-padded batches -- what every collator here
    produces): the kernel reduces it to one kv length per row and masks
    scores at ``k_idx >= len`` in-kernel, so the O(S^2) bias tensor of the
    XLA path never exists. Non-prefix masks would be silently treated as
    their ``sum`` prefix.

    Block sizes default to per-shape auto-tuning (``_auto_block``); explicit
    values pin the FORWARD blocks. The fused backward re-plans its own
    blocks for VMEM fit (``_fused_bwd_plan``) and may shrink below pinned
    values; set ``MLPT_FLASH_FUSED_BWD=0`` to use the split kernels, which
    honor the pinned sizes (halved only at head_dim > 128)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    b, h, sq, d = q.shape
    kv = k.shape[2]
    # A/B override for block-size experiments inside the production step
    # (callers pass no explicit blocks); unset = per-shape auto-tuning
    env_bq, env_bk = os.environ.get("MLPT_FLASH_BLOCK_Q"), os.environ.get("MLPT_FLASH_BLOCK_K")
    if block_q is None:
        block_q = int(env_bq) if env_bq else _auto_block(sq, DEFAULT_BLOCK_Q)
    if block_k is None:
        block_k = int(env_bk) if env_bk else _auto_block(kv, DEFAULT_BLOCK_K)
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, kv, d)
    vf = v.reshape(b * h, kv, d)
    if kv_len_mask is not None:
        lens = jnp.sum(kv_len_mask.astype(jnp.int32), axis=-1)  # [B]
        lens = jnp.broadcast_to(lens[:, None], (b, h)).reshape(b * h, 1)
        out = _flash_varlen(qf, kf, vf, lens, causal, sm_scale, block_q, block_k)
    else:
        out = _flash(qf, kf, vf, causal, sm_scale, block_q, block_k)
    return out.reshape(b, h, sq, d)
