"""Llama-3.2-1B decoder (flax): the LLaVA language model and the ViLT text
embedding source.

Public architecture (meta-llama/Llama-3.2-1B-Instruct, pulled by the
reference at ``src/models/llava.py:25,34``): 16 layers, hidden 2048, 32 q /
8 kv heads (GQA), SwiGLU ffn 8192, RMSNorm eps 1e-5, rope theta 500000 with
llama-3 frequency scaling (factor 32), vocab 128256, tied embeddings.
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
    attn_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        h = nn.RMSNorm(epsilon=RMS_EPS, dtype=self.dtype, name="ln_attn")(x)
        h = SelfAttention(
            num_heads=HEADS,
            head_dim=HIDDEN // HEADS,
            num_kv_heads=KV_HEADS,
            causal=True,
            rotary_dim=HIDDEN // HEADS,
            rotary_base=ROPE_THETA,
            rope_scaling=llama3_rope_scaling(factor=32.0),
            attn_impl=self.attn_impl,
            use_bias=False,
            dtype=self.dtype,
            name="attn",
        )(h)
        x = x + h
        h = nn.RMSNorm(epsilon=RMS_EPS, dtype=self.dtype, name="ln_mlp")(x)
        h = GatedMlp(intermediate=FFN, dtype=self.dtype, name="mlp")(h)
        return x + h, None


class LlamaDecoder(nn.Module):
    """Decoder trunk operating on input embeddings (LLaVA feeds merged
    text+image embeddings, so embedding lookup lives outside)."""

    attn_impl: str = "xla"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs_embeds):
        stack = make_stack(LlamaBlock, LAYERS, remat=self.remat, attn_impl=self.attn_impl, dtype=self.dtype)
        x, _ = stack(inputs_embeds, None)
        return nn.RMSNorm(epsilon=RMS_EPS, dtype=self.dtype, name="final_norm")(x)


LLAMA_TP_RULES = [
    (r"attn/qkv/kernel", ("data", "model")),
    (r"attn/out/kernel", ("model", "data")),
    (r"mlp/gate_up/kernel", ("data", "model")),
    (r"mlp/down/kernel", ("model", "data")),
    (r"embed_tokens", (None, "model")),
]
