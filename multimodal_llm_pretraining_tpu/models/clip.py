"""CLIP vision encoder (flax), used as the LLaVA tower and the ViLT trunk.

Architecture per the public OpenAI/LAION CLIP configs the reference pulls
from the hub (``src/models/llava.py:24,33``: openai/clip-vit-large-patch14-336;
``src/models/vilt.py:242-246``: laion/CLIP-ViT-g-14): conv patch embedding +
class token + learned positions, pre-LN transformer with (quick-)gelu MLP.
"""

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from .layers import Mlp, SelfAttention, make_stack


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPBlock(nn.Module):
    hidden: int
    num_heads: int
    intermediate: int
    activation: Callable = quick_gelu
    ln_eps: float = 1e-5  # CLIP; ViLT/BERT-family trunks use 1e-12
    attn_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_attn")(x)
        h = SelfAttention(
            num_heads=self.num_heads,
            head_dim=self.hidden // self.num_heads,
            causal=False,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            name="attn",
        )(h)
        x = x + h
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_mlp")(x)
        h = Mlp(intermediate=self.intermediate, activation=self.activation, dtype=self.dtype, name="mlp")(h)
        return x + h, None


class CLIPVisionEncoder(nn.Module):
    """Patch embed + cls + pos, optional pre-LN, then ``num_layers`` blocks.

    ``feature_layer=-2`` reproduces LLaVA's vision_feature_layer: the last
    block is architecturally present but its output is unused (XLA removes
    the dead compute, matching what HF discards).
    """

    hidden: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate: int = 4096
    patch: int = 14
    image_size: int = 336
    activation: Callable = quick_gelu
    feature_layer: int = -1  # -1 = full depth; -2 = skip last block
    use_pre_layernorm: bool = True
    attn_impl: str = "xla"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        b, h, w, c = pixel_values.shape
        gh, gw = h // self.patch, w // self.patch
        patches = pixel_values.reshape(b, gh, self.patch, gw, self.patch, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, gh * gw, self.patch * self.patch * c).astype(self.dtype)
        x = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype, name="patch_embed")(patches)

        cls = self.param("class_embedding", nn.initializers.normal(0.02), (1, 1, self.hidden))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.hidden)), x], axis=1)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02), (1, gh * gw + 1, self.hidden))
        x = x + pos.astype(self.dtype)
        if self.use_pre_layernorm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_ln")(x)

        effective_layers = self.num_layers + 1 + self.feature_layer if self.feature_layer < -1 else self.num_layers
        stack = make_stack(
            CLIPBlock,
            effective_layers,
            remat=self.remat,
            hidden=self.hidden,
            num_heads=self.num_heads,
            intermediate=self.intermediate,
            activation=self.activation,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
        )
        x, _ = stack(x, None)
        return x  # [B, 1 + gh*gw, hidden]
