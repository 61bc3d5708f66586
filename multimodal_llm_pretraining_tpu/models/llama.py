"""Llama-3-family decoder (flax): the LLaVA language model.

Defaults are meta-llama/Llama-3.2-1B-Instruct (pulled by the reference at
``src/models/llava.py:25,34``): 16 layers, hidden 2048, 32 q / 8 kv heads
(GQA), SwiGLU ffn 8192, RMSNorm eps 1e-5, rope theta 500000 with llama-3
frequency scaling (factor 32), vocab 128256, tied embeddings. All dims are
module fields so the same code loads any Llama-architecture checkpoint
(``models/weights.py`` reads them from the checkpoint's config.json).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import GatedMlp, SelfAttention, llama3_rope_scaling, make_stack

HIDDEN = 2048
LAYERS = 16
HEADS = 32
KV_HEADS = 8
FFN = 8192
VOCAB = 128256
ROPE_THETA = 500000.0
RMS_EPS = 1e-5


class LlamaBlock(nn.Module):
    hidden: int = HIDDEN
    num_heads: int = HEADS
    num_kv_heads: int = KV_HEADS
    ffn: int = FFN
    rope_theta: float = ROPE_THETA
    rope_scaling_factor: float | None = 32.0  # None = plain rope
    rms_eps: float = RMS_EPS
    attn_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        scaling = llama3_rope_scaling(factor=self.rope_scaling_factor) if self.rope_scaling_factor else None
        h = nn.RMSNorm(epsilon=self.rms_eps, dtype=self.dtype, name="ln_attn")(x)
        h = SelfAttention(
            num_heads=self.num_heads,
            head_dim=self.hidden // self.num_heads,
            num_kv_heads=self.num_kv_heads,
            causal=True,
            rotary_dim=self.hidden // self.num_heads,
            rotary_base=self.rope_theta,
            rope_scaling=scaling,
            attn_impl=self.attn_impl,
            use_bias=False,
            dtype=self.dtype,
            name="attn",
        )(h, mask=mask)
        x = x + h
        h = nn.RMSNorm(epsilon=self.rms_eps, dtype=self.dtype, name="ln_mlp")(x)
        h = GatedMlp(intermediate=self.ffn, dtype=self.dtype, name="mlp")(h)
        return x + h, None


class LlamaDecoder(nn.Module):
    """Decoder trunk operating on input embeddings (LLaVA feeds merged
    text+image embeddings, so embedding lookup lives outside)."""

    hidden: int = HIDDEN
    num_layers: int = LAYERS
    num_heads: int = HEADS
    num_kv_heads: int = KV_HEADS
    ffn: int = FFN
    rope_theta: float = ROPE_THETA
    rope_scaling_factor: float | None = 32.0
    rms_eps: float = RMS_EPS
    attn_impl: str = "xla"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs_embeds, mask=None):
        stack = make_stack(
            LlamaBlock,
            self.num_layers,
            remat=self.remat,
            hidden=self.hidden,
            num_heads=self.num_heads,
            num_kv_heads=self.num_kv_heads,
            ffn=self.ffn,
            rope_theta=self.rope_theta,
            rope_scaling_factor=self.rope_scaling_factor,
            rms_eps=self.rms_eps,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
        )
        x, _ = stack(inputs_embeds, mask)
        return nn.RMSNorm(epsilon=self.rms_eps, dtype=self.dtype, name="final_norm")(x)


LLAMA_TP_RULES = [
    (r"attn/qkv/kernel", ("data", "model")),
    (r"attn/out/kernel", ("model", "data")),
    (r"mlp/gate_up/kernel", ("data", "model")),
    (r"mlp/down/kernel", ("model", "data")),
    (r"embed_tokens", (None, "model")),
]
