"""Attention dispatcher: the TPU analog of the reference's per-model
``attn_implementation`` toggle (``sdpa`` vs ``eager``; ``src/models/pythia.py:18-21``).

- ``pallas`` -- fused flash-attention Pallas kernel (``ops/flash_attention.py``),
  the custom-kernel / free-lunch branch. Used on TPU when no irregular mask
  is required (causal + padding-to-length masks are handled in-kernel).
- ``xla``    -- jnp einsum attention with fp32 softmax; XLA fuses this well
  and it is the safe default on any backend.
- ``naive``  -- plain fp32 dot-product attention, the ``eager`` parity branch
  used for the naive (no-free-lunch) benchmark arm.
"""

from typing import Literal

import jax
import jax.numpy as jnp

AttnImpl = Literal["pallas", "xla", "naive"]


def default_attn_impl(use_custom_kernels: bool) -> AttnImpl:
    if not use_custom_kernels:
        return "naive"
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _mask_bias(shape_q: int, shape_k: int, causal: bool, segment_mask, dtype):
    """Additive bias from causal/padding masks; None when full attention."""
    bias = None
    if causal:
        idx_q = jnp.arange(shape_q)[:, None]
        idx_k = jnp.arange(shape_k)[None, :]
        bias = jnp.where(idx_q >= idx_k, 0.0, -jnp.inf).astype(jnp.float32)
    if segment_mask is not None:
        # segment_mask: [B, Sk] with 1 = attend, 0 = masked (HF attention_mask)
        m = jnp.where(segment_mask[:, None, None, :] > 0, 0.0, -jnp.inf).astype(jnp.float32)
        bias = m if bias is None else bias[None, None] + m
    return bias


def dot_product_attention(
    q: jax.Array,  # [B, H, Sq, D]
    k: jax.Array,  # [B, H, Sk, D]
    v: jax.Array,  # [B, H, Sk, D]
    *,
    causal: bool = False,
    mask: jax.Array | None = None,  # [B, Sk] keep-mask (1 = attend)
    impl: AttnImpl = "xla",
    sm_scale: float | None = None,
) -> jax.Array:
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5

    if impl == "pallas":
        from .flash_attention import flash_attention, flash_supported

        if flash_supported(q, k, v, mask):
            return flash_attention(q, k, v, causal=causal, sm_scale=sm_scale, kv_len_mask=mask)
        impl = "xla"

    if impl == "naive":
        # eager-parity branch: fp32 throughout, no fusion hints
        q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm_scale
        bias = _mask_bias(q.shape[2], k.shape[2], causal, mask, scores.dtype)
        if bias is not None:
            if bias.ndim == 2:
                bias = bias[None, None]
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    # xla impl: bf16 matmuls on the MXU, fp32 softmax accumulation
    out_dtype = q.dtype
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * sm_scale
    bias = _mask_bias(q.shape[2], k.shape[2], causal, mask, scores.dtype)
    if bias is not None:
        if bias.ndim == 2:
            bias = bias[None, None]
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(out_dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
