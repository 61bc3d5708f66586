"""Shared flax building blocks for the model zoo.

The reference delegates architecture to HuggingFace transformers; here each
family is built from these primitives. Design rules (TPU-first):

- all matmuls sized for the MXU (fused QKV, big Dense), bf16-friendly
- layer stacks via ``nn.scan`` (one trace per block -> fast XLA compiles)
- activation checkpointing via ``nn.remat`` around the scanned block, the
  ``jax.checkpoint`` analog of HF ``gradient_checkpointing`` (reference:
  ``src/train.py:112``, manual ConvNeXt graft ``src/models/convnext.py:118-149``)
- attention through ``ops.attention.dot_product_attention`` so the
  sdpa/eager custom-kernel toggle (``src/models/pythia.py:18-21``) maps to
  pallas/xla/naive
"""

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import AttnImpl, dot_product_attention

Dtype = jnp.dtype


# ------------------------------------------------------------------ rotary


def rotary_angles(positions: jax.Array, rotary_dim: int, base: float = 10000.0, scaling: Callable | None = None):
    inv_freq = 1.0 / (base ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    if scaling is not None:
        inv_freq = scaling(inv_freq)
    freqs = jnp.einsum("s,d->sd", positions.astype(jnp.float32), inv_freq)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate the first ``2 * cos.shape[-1]`` head dims (GPTNeoX/Llama
    rotate-half convention). x: [B, H, S, D]. Arithmetic runs in x's dtype
    (bf16 under mixed precision: the angle tables are fp32-accurate, and the
    product is elementwise -- keeping fp32 here doubled HBM traffic for no
    accuracy the MXU could see)."""
    rot = cos.shape[-1] * 2
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    x1, x2 = x_rot[..., : rot // 2], x_rot[..., rot // 2 :]
    cos = cos[None, None, :, :].astype(x.dtype)
    sin = sin[None, None, :, :].astype(x.dtype)
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    x_rot = jnp.concatenate([out1, out2], axis=-1)
    if x_pass.shape[-1]:
        return jnp.concatenate([x_rot, x_pass], axis=-1).astype(x.dtype)
    return x_rot.astype(x.dtype)


def llama3_rope_scaling(factor=32.0, low_freq_factor=1.0, high_freq_factor=4.0, original_max_position=8192):
    """Llama-3.x rope frequency scaling."""

    def scale(inv_freq):
        wavelen = 2 * jnp.pi / inv_freq
        low_wl = original_max_position / low_freq_factor
        high_wl = original_max_position / high_freq_factor
        smooth = (original_max_position / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = inv_freq / factor
        mid = (1 - smooth) * scaled + smooth * inv_freq
        return jnp.where(wavelen > low_wl, scaled, jnp.where(wavelen < high_wl, inv_freq, mid))

    return scale


# ------------------------------------------------------------------ modules


class SelfAttention(nn.Module):
    """Fused-QKV multi-head (optionally grouped-query) self-attention."""

    num_heads: int
    head_dim: int
    num_kv_heads: int | None = None  # GQA; None = MHA
    causal: bool = False
    rotary_dim: int = 0
    rotary_base: float = 10000.0
    rope_scaling: Callable | None = None
    attn_impl: AttnImpl = "xla"
    use_bias: bool = True
    out_bias: bool | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, positions=None):
        b, s, _ = x.shape
        h, d = self.num_heads, self.head_dim
        kvh = self.num_kv_heads or h

        qkv = nn.Dense((h + 2 * kvh) * d, use_bias=self.use_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, [h * d, (h + kvh) * d], axis=-1)
        q = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, kvh, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, kvh, d).transpose(0, 2, 1, 3)

        if self.rotary_dim:
            if positions is None:
                positions = jnp.arange(s)
            cos, sin = rotary_angles(positions, self.rotary_dim, self.rotary_base, self.rope_scaling)
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)

        if kvh != h:
            k = jnp.repeat(k, h // kvh, axis=1)
            v = jnp.repeat(v, h // kvh, axis=1)

        out = dot_product_attention(q, k, v, causal=self.causal, mask=mask, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        out_bias = self.use_bias if self.out_bias is None else self.out_bias
        return nn.Dense(x.shape[-1], use_bias=out_bias, dtype=self.dtype, name="out")(out)


class Mlp(nn.Module):
    intermediate: int
    activation: Callable = nn.gelu
    use_bias: bool = True
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.Dense(self.intermediate, use_bias=self.use_bias, dtype=self.dtype, name="up")(x)
        y = self.activation(y)
        y = nn.Dense(x.shape[-1], use_bias=self.use_bias, dtype=self.dtype, name="down")(y)
        if self.dropout:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y


class GatedMlp(nn.Module):
    """SwiGLU (Llama-style): fused gate+up projection, then down."""

    intermediate: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        gate_up = nn.Dense(2 * self.intermediate, use_bias=False, dtype=self.dtype, name="gate_up")(x)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        y = nn.silu(gate) * up
        return nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype, name="down")(y)


def make_stack(
    block_cls,
    num_layers: int,
    remat: bool,
    name: str = "layers",
    checkpoint_policy: str = "flash",
    unroll: bool = False,
    **block_kwargs,
):
    """Scan a block over the layer axis; optional remat per block.

    Remat policies (``checkpoint_policy``):

    - ``"flash"`` (default): everything recomputes except the flash-attention
      residuals (``flash_out``/``flash_lse``, named in
      ``ops/flash_attention.py``) -- re-running the attention kernel in the
      backward pass costs far more than storing its [B,H,S,D] output. When no
      flash kernel is in the graph (XLA attention path) the policy saves
      nothing, i.e. plain full remat, matching HF ``gradient_checkpointing``
      semantics. Maximum memory savings; recompute costs ~1 extra forward.
    - ``"dots"``: additionally saves every matmul output, so the backward
      recomputes only elementwise ops (activations, layernorms, rotary).
      Near-zero recompute FLOPs for ~2.5x the activation memory of "flash" --
      the right trade when HBM allows it (e.g. pythia-1b with the streaming
      host-offload optimizer). No torch analog: HF gradient_checkpointing is
      all-or-nothing per block.

    Returns a module instance whose __call__ is (carry, inputs...) -> carry.
    Blocks must have signature ``__call__(self, x, *args)`` returning x.
    """
    cls = block_cls
    if remat:
        flash_names = jax.checkpoint_policies.save_only_these_names("flash_out", "flash_lse")
        if checkpoint_policy == "dots":
            policy = jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable, flash_names
            )
        else:
            policy = flash_names
        cls = nn.remat(cls, prevent_cse=False, static_argnums=(), policy=policy)
    scanned = nn.scan(
        cls,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=nn.broadcast,  # non-carry args (masks) shared across layers
        length=num_layers,
        metadata_params={nn.PARTITION_NAME: "layers"},
        # Full unroll keeps the stacked [L, ...] param layout but removes the
        # XLA while-loop: the backward's layer-grad accumulation becomes a
        # straight dynamic-update-slice chain XLA aliases in place, instead
        # of a loop carry + output pair (2x the grad tree). That double
        # buffer is what keeps pythia-2.8b off a single 16 GB chip.
        unroll=num_layers if unroll else 1,
    )
    return scanned(name=name, **block_kwargs)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array, ignore_index: int = -100) -> jax.Array:
    """Mean token cross entropy in fp32, ignoring masked labels (HF semantics)."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = (logz - gold) * valid
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom
