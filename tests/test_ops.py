"""Kernel correctness: flash attention vs naive reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_llm_pretraining_tpu.ops.attention import dot_product_attention
from multimodal_llm_pretraining_tpu.ops.flash_attention import flash_attention


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


def test_auto_block_selection():
    from multimodal_llm_pretraining_tpu.ops.flash_attention import _auto_block

    # exact-fit production sequences keep the full default block
    assert _auto_block(2048, 512) == 512
    assert _auto_block(512, 512) == 512
    # ViT-L's S=577 would pad 512-blocks to 1024 (3.1x tile area); the
    # auto block shrinks to 128 (pad 640, 1.23x)
    assert _auto_block(577, 512) == 128
    # fused multimodal sequences (e.g. LLaVA ~1088) also prefer tight blocks
    assert _auto_block(1088, 512) == 128
    # short sequences floor at 128 (bounds-masked in-kernel)
    assert _auto_block(40, 512) == 128
    # moderate waste within 1/8 keeps the bigger block
    assert _auto_block(1536, 512) == 512
    assert _auto_block(1000, 512) == 512  # pad 1024, waste 2.3%


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [128, 200])
def test_flash_forward_matches_naive(causal, seq):
    q, k, v = (_rand((2, 2, seq, 64), s) for s in range(3))
    with jax.default_matmul_precision("highest"):
        ref = dot_product_attention(q, k, v, causal=causal, impl="naive")
        out = flash_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grads_match_naive(causal):
    q, k, v = (_rand((1, 2, 150, 64), s) for s in range(3))

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, causal=causal) ** 2).sum()

    def f_ref(q, k, v):
        return (dot_product_attention(q, k, v, causal=causal, impl="naive") ** 2).sum()

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("head_dim,block_q,block_k", [(64, 64, 64), (256, 256, 128)])
def test_flash_multiblock_grads_match_naive(causal, head_dim, block_q, block_k):
    """Small blocks force the loop-split paths: unmasked interior k/q blocks,
    the diagonal-masked blocks, and the bounds-masked tail; head_dim 256 with
    block_q 256 additionally exercises the halved dkv q-block (VMEM guard)."""
    seq = 200 if head_dim == 64 else 600
    q, k, v = (_rand((1, 2, seq, head_dim), s) for s in range(3))

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, causal=causal, block_q=block_q, block_k=block_k) ** 2).sum()

    def f_ref(q, k, v):
        return (dot_product_attention(q, k, v, causal=causal, impl="naive") ** 2).sum()

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("fused", [False, True])
def test_flash_bwd_both_paths_match_naive(causal, fused, monkeypatch):
    """Pin the backward gate each way (fused single-pass vs split dq/dkv)
    so both kernels stay covered whatever PREFER_FUSED_BWD defaults to."""
    from multimodal_llm_pretraining_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "PREFER_FUSED_BWD", fused)
    q, k, v = (_rand((1, 2, 200, 64), s) for s in range(3))

    def f_flash(q, k, v):
        return (fa.flash_attention(q, k, v, causal=causal, block_q=64, block_k=64) ** 2).sum()

    def f_ref(q, k, v):
        return (dot_product_attention(q, k, v, causal=causal, impl="naive") ** 2).sum()

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_flash_cross_attention():
    q = _rand((2, 2, 300, 64), 0)
    k = _rand((2, 2, 150, 64), 1)
    v = _rand((2, 2, 150, 64), 2)
    with jax.default_matmul_precision("highest"):
        ref = dot_product_attention(q, k, v, impl="naive")
        out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("fused", [False, True])
def test_flash_cross_attention_grads_match_naive(fused, monkeypatch):
    """Rectangular q/kv (ViT-text cross shapes): both backward paths'
    bounds-mask loop splits must handle kv_seq != q_seq with non-aligned
    tails."""
    from multimodal_llm_pretraining_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "PREFER_FUSED_BWD", fused)
    q = _rand((1, 2, 300, 64), 0)
    k = _rand((1, 2, 150, 64), 1)
    v = _rand((1, 2, 150, 64), 2)

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, block_q=128, block_k=128) ** 2).sum()

    def f_ref(q, k, v):
        return (dot_product_attention(q, k, v, impl="naive") ** 2).sum()

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_xla_impl_with_padding_mask():
    q, k, v = (_rand((2, 2, 64, 32), s) for s in range(3))
    mask = jnp.asarray(np.concatenate([np.ones((2, 40)), np.zeros((2, 24))], axis=1))
    out = dot_product_attention(q, k, v, mask=mask, impl="xla")
    ref = dot_product_attention(q, k, v, mask=mask, impl="naive")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_bwd_plan():
    """VMEM planning for the fused backward: full 512x512 blocks for every
    model-zoo shape, with a raised vmem limit at pythia-1b scale (Mosaic
    measured 18.54M actual vs the 16M default scoped budget); only absurd
    shapes shrink blocks or fall to the split kernels."""
    from multimodal_llm_pretraining_tpu.ops.flash_attention import _fused_bwd_plan, _vmem_cap

    for head_dim in (64, 128, 256):  # pythia-410m / llama / pythia-1b
        plan = _fused_bwd_plan(2049, head_dim, 512, 512)
        assert plan is not None
        bq, bk, limit = plan
        assert (bq, bk) == (512, 512)
        assert 16 * 2**20 <= limit <= _vmem_cap()
    # pythia-1b shapes need more than the 16 MiB default
    assert _fused_bwd_plan(2049, 256, 512, 512)[2] > 18 * 2**20
    # huge head dim at long seq: shrinks blocks before giving up
    plan = _fused_bwd_plan(8192, 512, 512, 512)
    assert plan is None or plan[:2] != (512, 512)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_shrunken_fused_grads_match_naive(causal, monkeypatch):
    """Force the adaptive path to pick a smaller fused config than requested
    and check grads stay exact (the shrunken blocks change the loop splits)."""
    from multimodal_llm_pretraining_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "PREFER_FUSED_BWD", True)
    real_plan = fa._fused_bwd_plan
    monkeypatch.setattr(
        fa, "_fused_bwd_plan", lambda qs, d, bq, bk: real_plan(qs, d, min(bq, 256), min(bk, 256))
    )
    q, k, v = (_rand((1, 1, 600, 256), s) for s in range(3))

    def f_flash(q, k, v):
        return (fa.flash_attention(q, k, v, causal=causal, block_q=512, block_k=512) ** 2).sum()

    def f_ref(q, k, v):
        return (dot_product_attention(q, k, v, causal=causal, impl="naive") ** 2).sum()

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("fused", [False, True])
def test_flash_varlen_padding_mask_matches_xla(causal, fused, monkeypatch):
    """[B, Sk] prefix keep-masks (right-padded batches, the LLaVA/ViLT
    collator contract) run in-kernel as per-row kv lengths; fwd and all
    three grads must match the XLA additive-bias path on BOTH backward
    paths. Loss is weighted by the mask so pad-row garbage (which the XLA
    path also produces) stays out of the comparison."""
    from multimodal_llm_pretraining_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "PREFER_FUSED_BWD", fused)
    B, H, S, D = 2, 2, 300, 64
    q, k, v = (_rand((B, H, S, D), s) for s in range(3))
    lens = np.array([S, 135])  # one full row, one padded mid-k-block
    mask = jnp.asarray((np.arange(S)[None, :] < lens[:, None]).astype(np.int32))
    w = mask[:, None, :, None].astype(jnp.float32)

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, causal=causal, kv_len_mask=mask, block_q=128, block_k=128) ** 2 * w).sum()

    def f_ref(q, k, v):
        return (dot_product_attention(q, k, v, causal=causal, mask=mask, impl="xla") ** 2 * w).sum()

    with jax.default_matmul_precision("highest"):
        o1 = flash_attention(q, k, v, causal=causal, kv_len_mask=mask, block_q=128, block_k=128)
        o2 = dot_product_attention(q, k, v, causal=causal, mask=mask, impl="xla")
        np.testing.assert_allclose(np.asarray(o1 * w), np.asarray(o2 * w), atol=2e-5)
        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_flash_supported_accepts_padding_masks():
    from multimodal_llm_pretraining_tpu.ops.flash_attention import flash_supported

    q = k = v = jnp.zeros((2, 2, 64, 64), jnp.float32)
    assert flash_supported(q, k, v, None)
    assert flash_supported(q, k, v, jnp.ones((2, 64), jnp.int32))
    # wrong batch / per-head masks still fall back
    assert not flash_supported(q, k, v, jnp.ones((3, 64), jnp.int32))
    assert not flash_supported(q, k, v, jnp.ones((2, 2, 64, 64), jnp.int32))
