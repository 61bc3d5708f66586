"""LLaVA multimodal pretraining and finetuning.

Reimplements the reference's ``LlavaForConditionalGeneration`` assembly
(``src/models/llava.py:22-264``): CLIP-ViT-L/14-336 vision tower ->
2-layer gelu MLP projector -> Llama-3.2-1B, with an added ``<image>`` token
(index 128256, embedding table resized to 128257). Each ``<image>`` token in
the input expands into the tower's 576 patch features (vision_feature_layer
-2, cls dropped), so seq 512 text becomes 1087 decoder positions.

- llava-pretrain: tower and LM frozen, projector-only training
  (``src/models/llava.py:49-52``); batch 256, 2180 steps, bf16, AdamW 1e-3,
  cosine 3% warmup.
- llava-finetune: tower frozen, LM+projector train; batch 128, 5197 steps,
  fp32, AdamW 2e-5.

The token->patch expansion is a static-shape gather (TPU-friendly): with the
image token at position p, output position j reads text token j (j < p),
image patch j - p (p <= j < p+576), or text token j - 575 after.
"""

from typing import Any, Literal

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import LlavaT, ModelBundle, MultimodalModelClass, SchedulerType
from .clip import CLIPVisionEncoder, quick_gelu
from .llama import LLAMA_TP_RULES, HIDDEN as LM_HIDDEN, LlamaDecoder

IMAGE_TOKEN = 128256
VOCAB_WITH_IMAGE = 128257
NUM_PATCHES = (336 // 14) ** 2  # 576
TOWER_HIDDEN = 1024


def merge_image_features(embeds, image_feats, input_ids, labels, image_token: int, attention_mask=None):
    """Expand the single <image> token into NUM_PATCHES feature positions.

    embeds: [B, S, H] text embeddings; image_feats: [B, P, H];
    returns merged [B, S-1+P, H] embeddings, expanded labels (-100 at image
    positions), and the expanded attention mask (patch positions attend).
    """
    b, s, h = embeds.shape
    p_count = image_feats.shape[1]
    out_len = s - 1 + p_count
    pos = jnp.argmax(input_ids == image_token, axis=1)  # [B]

    j = jnp.arange(out_len)[None, :]  # [1, out]
    pos_b = pos[:, None]
    is_img = (j >= pos_b) & (j < pos_b + p_count)
    text_idx = jnp.where(j < pos_b, j, j - (p_count - 1))
    text_idx = jnp.clip(text_idx, 0, s - 1)
    img_idx = jnp.clip(j - pos_b, 0, p_count - 1)

    text_part = jnp.take_along_axis(embeds, text_idx[..., None], axis=1)
    img_part = jnp.take_along_axis(image_feats, img_idx[..., None], axis=1)
    merged = jnp.where(is_img[..., None], img_part, text_part)

    merged_labels = None
    if labels is not None:
        lab = jnp.take_along_axis(labels, text_idx, axis=1)
        merged_labels = jnp.where(is_img, -100, lab)
    merged_mask = None
    if attention_mask is not None:
        am = jnp.take_along_axis(attention_mask, text_idx, axis=1)
        merged_mask = jnp.where(is_img, 1, am)
    return merged, merged_labels, merged_mask


class LlavaModule(nn.Module):
    attn_impl: str = "xla"
    remat: bool = False
    dtype: Any = jnp.float32
    # size overrides (checkpoint-driven or test-size); None = published dims
    tower_kwargs: dict | None = None
    lm_kwargs: dict | None = None
    vocab_with_image: int = VOCAB_WITH_IMAGE
    image_token: int = IMAGE_TOKEN

    @nn.compact
    def __call__(self, input_ids, pixel_values, labels=None, attention_mask=None, deterministic=True):
        from ..ops.xent import lm_head_loss

        tower_kwargs = dict(
            hidden=TOWER_HIDDEN,
            num_layers=24,
            num_heads=16,
            intermediate=4096,
            patch=14,
            image_size=336,
        )
        tower_kwargs.update(self.tower_kwargs or {})
        tower = CLIPVisionEncoder(
            **tower_kwargs,
            activation=quick_gelu,
            feature_layer=-2,
            attn_impl=self.attn_impl,
            remat=self.remat,
            dtype=self.dtype,
            name="vision_tower",
        )
        feats = tower(pixel_values, deterministic=deterministic)[:, 1:]  # drop CLS

        lm_kwargs = dict(self.lm_kwargs or {})
        lm_hidden = lm_kwargs.get("hidden", LM_HIDDEN)

        # projector: Dense -> gelu -> Dense (LlavaMultiModalProjector)
        feats = nn.Dense(lm_hidden, dtype=self.dtype, name="projector_in")(feats)
        feats = nn.gelu(feats)
        feats = nn.Dense(lm_hidden, dtype=self.dtype, name="projector_out")(feats)

        embed = self.param("language_model_embed_tokens", nn.initializers.normal(0.02), (self.vocab_with_image, lm_hidden))
        text_embeds = jnp.take(embed, input_ids, axis=0).astype(self.dtype)
        merged, merged_labels, merged_mask = merge_image_features(
            text_embeds, feats, input_ids, labels, self.image_token, attention_mask
        )
        lm = LlamaDecoder(**lm_kwargs, attn_impl=self.attn_impl, remat=self.remat, dtype=self.dtype, name="language_model")
        hidden = lm(merged, mask=merged_mask)

        kernel = embed.T.astype(self.dtype)  # llama-3.2-1b ties embeddings
        if labels is None:
            return jnp.dot(hidden, kernel)
        return lm_head_loss(hidden, kernel, merged_labels, shift=True)


class _LlavaBase(MultimodalModelClass[LlavaT]):
    image_token_index = IMAGE_TOKEN

    def _build(self, use_custom_kernels, activation_checkpointing, compute_dtype, freeze_prefixes):
        import os

        from ..ops.attention import default_attn_impl

        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if self.mixed_precision else jnp.float32

        # Pretrained assembly (reference ``src/models/llava.py:30-45``): point
        # these at local save_pretrained dirs of the CLIP tower and Llama LM.
        # Without them the towers are random-initialized (timing-equivalent).
        clip_dir = os.environ.get("MLPT_LLAVA_CLIP_DIR")
        llama_dir = os.environ.get("MLPT_LLAVA_LLAMA_DIR")
        tower_kwargs = lm_kwargs = None
        image_size = 336
        if os.environ.get("MLPT_LLAVA_TEST_DIMS") and not (clip_dir and llama_dir):
            # CI/dry-run knob: published architecture at toy dims, so the
            # full sharded llava step (freeze masks + TP rules + merged-seq
            # flash path) compiles and executes on a virtual CPU mesh
            tower_kwargs = dict(hidden=32, num_layers=2, num_heads=2, intermediate=64, patch=14, image_size=28)
            lm_kwargs = dict(hidden=64, num_layers=2, num_heads=4, num_kv_heads=2, ffn=128)
            image_size = 28
        elif clip_dir and llama_dir:
            from .weights import clip_module_kwargs, llama_module_kwargs, read_config

            clip_cfg = read_config(clip_dir)
            tower_kwargs = clip_module_kwargs(clip_cfg.get("vision_config", clip_cfg))
            lm_kwargs = llama_module_kwargs(read_config(llama_dir))
            image_size = tower_kwargs["image_size"]

        module = LlavaModule(
            attn_impl=default_attn_impl(use_custom_kernels),
            remat=activation_checkpointing,
            dtype=compute_dtype,
            tower_kwargs=tower_kwargs,
            lm_kwargs=lm_kwargs,
        )

        def init_fn(rng):
            params = module.init(
                rng, jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            )["params"]
            if clip_dir and llama_dir:
                from .weights import llava_params_from_pretrained

                params = llava_params_from_pretrained(clip_dir, llama_dir, params)
            return params

        def loss_fn(params, batch, rng=None, train=True):
            loss = module.apply(
                {"params": params},
                batch["input_ids"],
                batch["pixel_values"],
                labels=batch["labels"],
                attention_mask=batch.get("attention_mask"),
            )
            return loss, {"loss": loss}

        # trainable mask from param paths (the requires_grad=False analog,
        # src/models/llava.py:49-52 / :175-178)
        shapes = jax.eval_shape(init_fn, jax.random.key(0))

        def trainable(path_leaf):
            path, _ = path_leaf
            pathstr = "/".join(str(getattr(p, "key", p)) for p in path)
            return not any(pathstr.startswith(pfx) for pfx in freeze_prefixes)

        flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
        mask = jax.tree_util.tree_unflatten(treedef, [trainable(pl) for pl in flat])
        return ModelBundle(init_fn=init_fn, loss_fn=loss_fn, trainable_mask=mask, tp_rules=LLAMA_TP_RULES)

    @property
    def scheduler_type(self) -> SchedulerType:
        return SchedulerType.COSINE

    @property
    def scheduler_kwargs(self) -> dict[str, Any]:
        return {"num_warmup_steps": int(self.training_steps * 0.03)}

    @property
    def max_grad_norm(self) -> float:
        return 0.0

    @property
    def optimizer(self) -> Literal["adam", "adamw"]:
        return "adamw"

    @property
    def fsdp_layers_to_wrap(self) -> list[str]:
        return ["LlamaBlock"]

    @property
    def image_size(self) -> int:
        # follows the env-configured tower checkpoint when one is wired in
        # (MLPT_LLAVA_CLIP_DIR), so the data pipeline sizes images to what
        # the assembled model actually ingests
        import os

        clip_dir = os.environ.get("MLPT_LLAVA_CLIP_DIR")
        if clip_dir:
            from .weights import read_config

            cfg = read_config(clip_dir)
            return int(cfg.get("vision_config", cfg).get("image_size", 336))
        if os.environ.get("MLPT_LLAVA_TEST_DIMS"):
            return 28
        return 336

    @property
    def vocab_size(self) -> int:
        return 128256

    @property
    def sequence_length(self) -> int:
        # declared max context (src/models/llava.py:145-146); benchmark dummy
        # data uses 512 (src/models/__init__.py:222)
        return 131072


class LlavaPretrainModelClass(_LlavaBase):
    def build_model(self, use_custom_kernels=True, activation_checkpointing=False, compute_dtype=None) -> ModelBundle:
        # projector-only training: freeze tower + language model + embeddings
        return self._build(
            use_custom_kernels,
            activation_checkpointing,
            compute_dtype,
            freeze_prefixes=("vision_tower", "language_model"),
        )

    @property
    def batch_size(self) -> int:
        return 256

    @property
    def training_steps(self) -> int:
        return 2180

    @property
    def mixed_precision(self) -> Literal[None, "bf16", "fp16"]:
        return "bf16"

    @property
    def optimizer_kwargs(self) -> dict[str, Any]:
        return {"lr": 1e-3, "weight_decay": 0.0}


class LlavaFinetuneModelClass(_LlavaBase):
    def build_model(self, use_custom_kernels=True, activation_checkpointing=False, compute_dtype=None) -> ModelBundle:
        # tower frozen; LM + projector (+ embeddings) train
        return self._build(
            use_custom_kernels,
            activation_checkpointing,
            compute_dtype,
            freeze_prefixes=("vision_tower",),
        )

    @property
    def batch_size(self) -> int:
        return 128

    @property
    def training_steps(self) -> int:
        return 5197

    @property
    def mixed_precision(self) -> Literal[None, "bf16", "fp16"]:
        return None

    @property
    def optimizer_kwargs(self) -> dict[str, Any]:
        return {"lr": 2e-5, "weight_decay": 0.0}
