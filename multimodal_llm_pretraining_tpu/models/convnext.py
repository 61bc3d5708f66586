"""ConvNeXt image-classification pretraining.

Reimplements the reference's ``ConvNextForImageClassification`` workloads
(``src/models/convnext.py:18-115``): large (depths 3/3/27/3, dims
192/384/768/1536) and xlarge (dims 256/512/1024/2048) at 224px, 1k or 21841
classes. Recipe: batch 4096, 93,600 (1k) / 311,940 (22k) steps, fp32, AdamW
lr 4e-3 wd 0.05, cosine schedule, no clipping.

The reference had to graft activation checkpointing onto the HF encoder by
class-swapping (``src/models/convnext.py:118-149``); here remat is just
``nn.remat`` around each stage's scanned block. Layout is NHWC with
depthwise 7x7 convs -- XLA's native TPU conv layout.
"""

from typing import Any, Literal

import flax.linen as nn
import jax.numpy as jnp

from . import ConvNextT, ModelBundle, SchedulerType, VisionModelClass
from .layers import cross_entropy_loss, make_stack

CONFIGS = {
    "convnext-large-1k": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), num_classes=1000),
    "convnext-large-22k": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), num_classes=21841),
    "convnext-xlarge-22k": dict(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048), num_classes=21841),
}

LN_EPS = 1e-6


class ConvNextBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        # depthwise 7x7 -> LN -> pw expand 4x -> gelu -> pw back -> layerscale
        h = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim, dtype=self.dtype, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pw_up")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pw_down")(h)
        gamma = self.param("layer_scale", nn.initializers.constant(1e-6), (self.dim,))
        return x + gamma.astype(self.dtype) * h, None


class ConvNextClassifier(nn.Module):
    depths: tuple = (3, 3, 27, 3)
    dims: tuple = (192, 384, 768, 1536)
    num_classes: int = 21841
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        x = pixel_values.astype(self.dtype)
        # stem: 4x4 conv stride 4 + LN
        x = nn.Conv(self.dims[0], (4, 4), strides=4, dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="stem_ln")(x)
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i > 0:
                x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name=f"down_ln_{i}")(x)
                x = nn.Conv(dim, (2, 2), strides=2, dtype=self.dtype, name=f"down_conv_{i}")(x)
            stack = make_stack(ConvNextBlock, depth, remat=self.remat, name=f"stage_{i}", dim=dim, dtype=self.dtype)
            x, _ = stack(x, None)
        x = x.mean(axis=(1, 2))  # global average pool
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="head_ln")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)


class ConvNextModelClass(VisionModelClass[ConvNextT]):
    def build_model(
        self, use_custom_kernels: bool = True, activation_checkpointing: bool = False, compute_dtype=None
    ) -> ModelBundle:
        cfg = CONFIGS[self.model_type]
        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if self.mixed_precision else jnp.float32
        module = ConvNextClassifier(
            depths=cfg["depths"], dims=cfg["dims"], num_classes=cfg["num_classes"], remat=activation_checkpointing, dtype=compute_dtype
        )

        def init_fn(rng):
            return module.init(rng, jnp.zeros((1, self.image_size, self.image_size, 3), jnp.float32))["params"]

        def loss_fn(params, batch, rng=None, train=True):
            logits = module.apply({"params": params}, batch["pixel_values"], deterministic=not train)
            loss = cross_entropy_loss(logits[:, None, :], batch["labels"][:, None])
            return loss, {"loss": loss}

        return ModelBundle(init_fn=init_fn, loss_fn=loss_fn)

    @property
    def supports_activation_checkpointing(self) -> bool:
        # native here (the reference added it manually)
        return True

    @property
    def batch_size(self) -> int:
        return 4096

    @property
    def training_steps(self) -> int:
        return 93600 if self.model_type == "convnext-large-1k" else 311940

    @property
    def mixed_precision(self) -> Literal[None, "bf16", "fp16"]:
        return None

    @property
    def optimizer(self) -> Literal["adam", "adamw"]:
        return "adamw"

    @property
    def optimizer_kwargs(self) -> dict[str, Any]:
        return {"lr": 4e-3, "betas": (0.9, 0.999), "weight_decay": 0.05}

    @property
    def scheduler_type(self) -> SchedulerType:
        return SchedulerType.COSINE

    @property
    def scheduler_kwargs(self) -> dict[str, Any]:
        if self.model_type == "convnext-large-1k":
            return {"num_warmup_steps": 312 * 20}
        return {"num_warmup_steps": 3466 * 5}

    @property
    def max_grad_norm(self) -> float:
        return 0.0

    @property
    def fsdp_layers_to_wrap(self) -> list[str]:
        return ["ConvNextBlock"]

    @property
    def image_size(self) -> int:
        return 224

    @property
    def num_classes(self) -> int:
        return CONFIGS[self.model_type]["num_classes"]
