"""ViT-large image-classification pretraining.

Reimplements the reference's ``ViTForImageClassification`` workload
(``src/models/vit.py:9-69``): ViT-L/16 at 224px (24 pre-LN layers, hidden
1024, heads 16, ffn 4096), 21841 ImageNet-21k classes, hidden dropout 0.1.
Recipe: batch 4096, 311,948 steps, fp32 compute, Adam lr 1e-3, linear
schedule with 10k warmup.

TPU-first details: NHWC pixel layout; the patch embedding runs as a single
[B, 196, 768] x [768, 1024] matmul (reshape, not conv) so it lands on the
MXU directly.
"""

from typing import Any, Literal

import flax.linen as nn
import jax.numpy as jnp

from . import ModelBundle, SchedulerType, ViTT, VisionModelClass
from .layers import Mlp, SelfAttention, make_stack

HIDDEN = 1024
LAYERS = 24
HEADS = 16
FFN = 4096
PATCH = 16
LN_EPS = 1e-12


class ViTBlock(nn.Module):
    """Pre-LN encoder block."""

    attn_impl: str = "xla"
    dropout: float = 0.1
    deterministic: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        deterministic = self.deterministic
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_attn")(x)
        h = SelfAttention(
            num_heads=HEADS, head_dim=HIDDEN // HEADS, causal=False, attn_impl=self.attn_impl, dtype=self.dtype, name="attn"
        )(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_mlp")(x)
        h = Mlp(intermediate=FFN, dropout=self.dropout, dtype=self.dtype, name="mlp")(h, deterministic=deterministic)
        return x + h, None


class ViTClassifier(nn.Module):
    num_classes: int = 21841
    image_size: int = 224
    attn_impl: str = "xla"
    remat: bool = False
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        # pixel_values: [B, H, W, 3] (NHWC); patchify via reshape -> matmul
        b, h, w, c = pixel_values.shape
        gh, gw = h // PATCH, w // PATCH
        patches = pixel_values.reshape(b, gh, PATCH, gw, PATCH, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, gh * gw, PATCH * PATCH * c).astype(self.dtype)
        x = nn.Dense(HIDDEN, dtype=self.dtype, name="patch_embed")(patches)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, HIDDEN))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, HIDDEN)), x], axis=1)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02), (1, gh * gw + 1, HIDDEN))
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        stack = make_stack(
            ViTBlock,
            LAYERS,
            remat=self.remat,
            attn_impl=self.attn_impl,
            dropout=self.dropout,
            deterministic=deterministic,
            dtype=self.dtype,
        )
        x, _ = stack(x, None)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="final_ln")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x[:, 0])


VIT_TP_RULES = [
    (r"attn/qkv/kernel", ("data", "model")),
    (r"attn/out/kernel", ("model", "data")),
    (r"mlp/up/kernel", ("data", "model")),
    (r"mlp/down/kernel", ("model", "data")),
    (r"classifier/kernel", (None, "model")),
]


class ViTModelClass(VisionModelClass[ViTT]):
    def build_model(
        self, use_custom_kernels: bool = True, activation_checkpointing: bool = False, compute_dtype=None
    ) -> ModelBundle:
        from ..ops.attention import default_attn_impl
        from .layers import cross_entropy_loss

        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if self.mixed_precision else jnp.float32
        module = ViTClassifier(
            num_classes=self.num_classes,
            image_size=self.image_size,
            attn_impl=default_attn_impl(use_custom_kernels),
            remat=activation_checkpointing,
            dtype=compute_dtype,
        )

        def init_fn(rng):
            return module.init(rng, jnp.zeros((1, self.image_size, self.image_size, 3), jnp.float32))["params"]

        def loss_fn(params, batch, rng=None, train=True):
            rngs = {"dropout": rng} if (train and rng is not None) else None
            logits = module.apply({"params": params}, batch["pixel_values"], deterministic=not train, rngs=rngs)
            loss = cross_entropy_loss(logits[:, None, :], batch["labels"][:, None])
            return loss, {"loss": loss}

        return ModelBundle(init_fn=init_fn, loss_fn=loss_fn, tp_rules=VIT_TP_RULES)

    @property
    def batch_size(self) -> int:
        return 4096

    @property
    def training_steps(self) -> int:
        return 311948

    @property
    def mixed_precision(self) -> Literal[None, "bf16", "fp16"]:
        return None

    @property
    def optimizer(self) -> Literal["adam", "adamw"]:
        return "adam"

    @property
    def optimizer_kwargs(self) -> dict[str, Any]:
        return {"lr": 1e-3, "betas": (0.9, 0.999), "weight_decay": 0.03}

    @property
    def scheduler_type(self) -> SchedulerType:
        return SchedulerType.LINEAR

    @property
    def scheduler_kwargs(self) -> dict[str, Any]:
        return {"num_warmup_steps": 10000}

    @property
    def max_grad_norm(self) -> float:
        return 1.0

    @property
    def fsdp_layers_to_wrap(self) -> list[str]:
        return ["ViTBlock"]

    @property
    def image_size(self) -> int:
        return 224

    @property
    def num_classes(self) -> int:
        return 21841
