"""ViLT-style single-tower multimodal pretraining (custom CLIP-g variant).

Reimplements the reference's from-scratch ViLT (``src/models/vilt.py``):
a fused text+image encoder with three pretraining heads --

- MLM over the text span (``:160-171``)
- ITM binary match on the pooled output (``:173-183``)
- WPA: optimal-transport word-patch alignment via 50-iteration IPOT in an
  fp32 no-grad island; gradient flows only through the cosine cost matrix
  (``:185-225``, ``ipot`` at ``:49-79``)

Architecture (custom variant, ``:341-366``): CLIP-ViT-g/14 trunk (hidden
1408, 40 layers, 16 heads, ffn 6144) over the concatenated [text; image]
sequence; text tokens are Llama-3.2-1B embeddings (2048) linearly projected
into the trunk width (``TextEmbeddings.projection``, ``:605-644``); image
224px -> 256 patches + cls. The reference's forward runs a separate full
encoder pass per task (3 passes/step) -- reproduced here for workload parity.

Recipe: batch 128, 10k steps, fp32, AdamW 1e-4 wd 0.01, linear 10% warmup.
``supports_activation_checkpointing=False`` kept for search-space parity
(``:374-379``) even though remat would work.
"""

from typing import Any, Literal

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import ModelBundle, MultimodalModelClass, SchedulerType, ViltT
from .clip import CLIPBlock
from .layers import make_stack

BIG = 1e4


# ------------------------------------------------------------------ IPOT


def cost_matrix_cosine(x, y, eps=1e-5):
    """Pairwise cosine distance (``src/models/vilt.py:27-37``)."""
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    return 1.0 - jnp.einsum("bmd,bnd->bmn", xn, yn)


def ipot(C, x_len, x_pad, y_len, y_pad, joint_pad, beta, iteration, k):
    """Inexact proximal point OT (``src/models/vilt.py:49-79``), no-grad.

    C: [B, M, N]; returns transport plan T: [B, N, M].
    """
    b, m, n = C.shape
    sigma = jnp.where(x_pad, 0.0, 1.0 / x_len[:, None])  # [B, M]
    jp_t = jnp.swapaxes(joint_pad, 1, 2)  # [B, N, M]
    T = jnp.where(jp_t, 0.0, 1.0)
    A = jnp.where(jp_t, 0.0, jnp.exp(-jnp.swapaxes(C, 1, 2) / beta))

    x_lenb = x_len[:, None, None]
    y_lenb = y_len[:, None, None]
    x_mask = x_pad.astype(C.dtype)[:, None, :] * BIG  # [B, 1, M]
    y_mask = y_pad.astype(C.dtype)[:, None, :] * BIG  # [B, 1, N]

    def outer(_, carry):
        T, sigma = carry
        Q = A * T  # [B, N, M]
        sigma_col = sigma.reshape(b, m, 1)

        def inner(_, c):
            sigma_col, delta = c
            delta = 1.0 / (y_lenb * jnp.einsum("bnm,bmi->bni", Q, sigma_col).reshape(b, 1, n) + y_mask)
            sigma_row = 1.0 / (x_lenb * jnp.einsum("bin,bnm->bim", delta, Q) + x_mask)  # [B, 1, M]
            return sigma_row.reshape(b, m, 1), delta

        sigma_col, delta = jax.lax.fori_loop(0, k, inner, (sigma_col, jnp.zeros((b, 1, n), C.dtype)))
        T = delta.reshape(b, n, 1) * Q * sigma_col.reshape(b, 1, m)
        return T, sigma_col.reshape(b, m)

    T, _ = jax.lax.fori_loop(0, iteration, outer, (T, sigma))
    return jnp.where(jp_t, 0.0, T)


def wpa_loss(txt_emb, img_emb, txt_mask_keep, img_mask_keep, itm_labels):
    """OT distance margin between matched and mismatched pairs
    (``src/models/vilt.py:185-228``): IPOT runs detached; gradients flow
    through the cost matrix only; loss weighted 0.1."""
    txt_emb = txt_emb.astype(jnp.float32)
    img_emb = img_emb.astype(jnp.float32)
    txt_pad = ~txt_mask_keep
    img_pad = ~img_mask_keep

    cost = cost_matrix_cosine(txt_emb, img_emb)
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
    cost = jnp.where(joint_pad, 0.0, cost)

    txt_len = (txt_mask_keep.sum(axis=1)).astype(cost.dtype)
    img_len = (img_mask_keep.sum(axis=1)).astype(cost.dtype)
    T = ipot(
        jax.lax.stop_gradient(cost), txt_len, txt_pad, img_len, img_pad, joint_pad, beta=0.5, iteration=50, k=1
    )
    distance = jnp.einsum("bmn,bnm->b", cost, jax.lax.stop_gradient(T))

    pos = itm_labels == 1
    dist_pos = jnp.where(pos, distance, 0.0).sum()
    dist_neg = jnp.where(~pos, distance, 0.0).sum()
    return 0.1 * (dist_pos - dist_neg) / distance.shape[0]


# ------------------------------------------------------------------ module


class ViltEncoderModule(nn.Module):
    """Fused-tower trunk: projected text embeddings + patch embeddings ->
    transformer -> (sequence_output, pooled_output)."""

    hidden: int = 1408
    num_layers: int = 40
    num_heads: int = 16
    intermediate: int = 6144
    patch: int = 14
    image_size: int = 224
    vocab_size: int = 128256
    token_embed_dim: int = 2048
    max_position: int = 2048
    attn_impl: str = "xla"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids, pixel_values, deterministic=True):
        b, s_t = input_ids.shape
        # text embeddings: word -> projection -> + type + pos -> LN
        word = self.param("word_embeddings", nn.initializers.normal(0.02), (self.vocab_size, self.token_embed_dim))
        t = jnp.take(word, input_ids, axis=0, mode="clip").astype(self.dtype)
        t = nn.Dense(self.hidden, dtype=self.dtype, name="text_projection")(t)
        type_emb = self.param("token_type_embeddings", nn.initializers.normal(0.02), (2, self.hidden))
        pos_emb = self.param("text_position_embeddings", nn.initializers.normal(0.02), (self.max_position, self.hidden))
        t = t + jnp.take(type_emb, token_type_ids, axis=0).astype(self.dtype) + pos_emb[None, :s_t].astype(self.dtype)
        t = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="text_ln")(t)

        # image embeddings: patchify + cls + pos + type-1
        bi, hh, ww, c = pixel_values.shape
        gh, gw = hh // self.patch, ww // self.patch
        patches = pixel_values.reshape(bi, gh, self.patch, gw, self.patch, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(bi, gh * gw, self.patch * self.patch * c).astype(self.dtype)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="patch_embed")(patches)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.hidden))
        v = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (bi, 1, self.hidden)), v], axis=1)
        img_pos = self.param("image_position_embeddings", nn.initializers.normal(0.02), (1, gh * gw + 1, self.hidden))
        v = v + img_pos.astype(self.dtype) + type_emb[1].astype(self.dtype)

        x = jnp.concatenate([t, v], axis=1)
        stack = make_stack(
            CLIPBlock,
            self.num_layers,
            remat=self.remat,
            hidden=self.hidden,
            num_heads=self.num_heads,
            intermediate=self.intermediate,
            activation=nn.gelu,
            ln_eps=1e-12,  # ViLT/BERT layer_norm_eps
            attn_impl=self.attn_impl,
            dtype=self.dtype,
        )
        x, _ = stack(x, None)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="final_ln")(x)
        pooled = nn.tanh(nn.Dense(self.hidden, dtype=self.dtype, name="pooler")(x[:, 0]))
        return x, pooled


class ViltForPretrainModule(nn.Module):
    target_tasks: tuple = ("mlm", "itm", "wpa")
    hidden: int = 1408
    num_layers: int = 40
    num_heads: int = 16
    intermediate: int = 6144
    patch: int = 14
    image_size: int = 224
    vocab_size: int = 128256
    token_embed_dim: int = 2048
    attn_impl: str = "xla"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, deterministic=True):
        from ..ops.xent import lm_head_loss
        from .layers import cross_entropy_loss

        trunk = ViltEncoderModule(
            hidden=self.hidden,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate=self.intermediate,
            patch=self.patch,
            image_size=self.image_size,
            vocab_size=self.vocab_size,
            token_embed_dim=self.token_embed_dim,
            attn_impl=self.attn_impl,
            remat=self.remat,
            dtype=self.dtype,
            name="vilt",
        )
        s_t = batch["input_ids"].shape[1]
        metrics = {}
        total = 0.0

        if "mlm" in self.target_tasks:
            seq, _ = trunk(batch["mlm_input_ids"], batch["mlm_token_type_ids"], batch["mlm_pixel_values"], deterministic)
            text_feats = seq[:, :s_t]
            # ViltMLMHead: LN -> dense -> gelu -> LN -> decoder(+bias)
            h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="mlm_ln0")(text_feats)
            h = nn.Dense(self.hidden, dtype=self.dtype, name="mlm_dense")(h)
            h = nn.gelu(h)
            h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="mlm_ln1")(h)
            dec = self.param("mlm_decoder", nn.initializers.lecun_normal(), (self.hidden, self.vocab_size))
            dec_b = self.param("mlm_decoder_bias", nn.initializers.zeros, (self.vocab_size,))
            mlm_loss = lm_head_loss(h, dec.astype(self.dtype), batch["mlm_labels"], shift=False, bias=dec_b)
            metrics["mlm_loss"] = mlm_loss
            total = total + mlm_loss

        if "itm" in self.target_tasks:
            _, pooled = trunk(batch["itm_input_ids"], batch["itm_token_type_ids"], batch["itm_pixel_values"], deterministic)
            logits = nn.Dense(2, dtype=self.dtype, name="itm_head")(pooled)
            itm_loss = cross_entropy_loss(logits[:, None, :], batch["itm_labels"][:, None])
            metrics["itm_loss"] = itm_loss
            total = total + itm_loss

        if "wpa" in self.target_tasks:
            # third full pass on the itm inputs, exactly like the reference
            seq, _ = trunk(batch["itm_input_ids"], batch["itm_token_type_ids"], batch["itm_pixel_values"], deterministic)
            txt_emb, img_emb = seq[:, :s_t], seq[:, s_t:]
            txt_keep = batch["itm_attention_mask"].astype(bool)
            # drop the final valid token and position 0 (reference :198-201)
            lengths = txt_keep.sum(axis=1)
            idx = jnp.arange(s_t)[None, :]
            txt_keep = txt_keep & (idx != (lengths[:, None] - 1)) & (idx != 0)
            img_keep = jnp.ones(img_emb.shape[:2], bool).at[:, 0].set(False)
            loss_w = wpa_loss(txt_emb, img_emb, txt_keep, img_keep, batch["itm_labels"])
            metrics["wpa_loss"] = loss_w
            total = total + loss_w

        metrics["loss"] = total
        return total, metrics


# ------------------------------------------------------------------ classes


class _ViltBase(MultimodalModelClass[ViltT]):
    target_tasks: tuple = ("mlm", "itm", "wpa")
    module_kwargs: dict = {}

    def build_model(self, use_custom_kernels=True, activation_checkpointing=False, compute_dtype=None) -> ModelBundle:
        from ..ops.attention import default_attn_impl

        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if self.mixed_precision else jnp.float32
        module = ViltForPretrainModule(
            target_tasks=self.target_tasks,
            attn_impl=default_attn_impl(use_custom_kernels),
            remat=activation_checkpointing,
            dtype=compute_dtype,
            **self.module_kwargs,
        )
        image_size = self.image_size

        def init_fn(rng):
            b = {}
            ones = jnp.ones((1, 8), jnp.int32)
            img = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            for pfx in ("", "mlm_", "itm_"):
                b[f"{pfx}input_ids"] = ones
                b[f"{pfx}token_type_ids"] = ones * 0
                b[f"{pfx}attention_mask"] = ones
                b[f"{pfx}pixel_values"] = img
            b["mlm_labels"] = ones
            b["itm_labels"] = jnp.zeros((1,), jnp.int32)
            params = module.init(jax.random.key(0), b)["params"]

            # pretrained encoder graft (reference src/models/vilt_original.py:238
            # replaces only vilt.encoder with dandelin/vilt-b32-mlm's)
            import os

            vilt_dir = os.environ.get("MLPT_VILT_DIR")
            if vilt_dir and self.module_kwargs.get("hidden", 1408) == 768:
                from .weights import load_vilt_encoder, overlay

                params = dict(params)
                params["vilt"] = overlay(dict(params["vilt"]), load_vilt_encoder(vilt_dir))
            return params

        def loss_fn(params, batch, rng=None, train=True):
            return module.apply({"params": params}, batch, deterministic=not train)

        return ModelBundle(init_fn=init_fn, loss_fn=loss_fn)

    @property
    def supports_activation_checkpointing(self) -> bool:
        # parity with the reference flag (src/models/vilt.py:374-379)
        return False

    @property
    def mixed_precision(self) -> Literal[None, "bf16", "fp16"]:
        return None

    @property
    def optimizer(self) -> Literal["adam", "adamw"]:
        return "adamw"

    @property
    def optimizer_kwargs(self) -> dict[str, Any]:
        return {"lr": 1e-4, "weight_decay": 0.01}

    @property
    def scheduler_type(self) -> SchedulerType:
        return SchedulerType.LINEAR

    @property
    def scheduler_kwargs(self) -> dict[str, Any]:
        return {"num_warmup_steps": int(self.training_steps * 0.10)}

    @property
    def max_grad_norm(self) -> float:
        return 0.0

    @property
    def batch_size(self) -> int:
        return 128

    @property
    def fsdp_layers_to_wrap(self) -> list[str]:
        return ["CLIPBlock"]

    @property
    def image_size(self) -> int:
        return 224

    @property
    def vocab_size(self) -> int:
        return 128256

    @property
    def sequence_length(self) -> int:
        return 2048


class ViltPretrainModelClass(_ViltBase):
    @property
    def training_steps(self) -> int:
        return 10000


class ViltFinetuneModelClass(_ViltBase):
    target_tasks = ("mlm",)  # reference :361: finetune trains MLM only

    @property
    def training_steps(self) -> int:
        return 5197
