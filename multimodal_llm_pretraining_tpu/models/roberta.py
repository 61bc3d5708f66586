"""RoBERTa-large masked-LM pretraining.

Reimplements the reference's ``RobertaForMaskedLM`` workload
(``src/models/roberta.py:14-70``): 24-layer post-LN encoder, hidden 1024,
heads 16, ffn 4096, vocab 50265, seq 512, learned positions; MLM head with
dense+gelu+LN then a decoder tied to the word embeddings. Recipe: batch
8192, 500k steps, Adam lr 4e-4 betas (0.9, 0.98), linear schedule with 30k
warmup, no grad clipping, fp16 -> bf16 on TPU.

The tied decoder runs through the chunked-xent head (``ops/xent.py``), so
the [B, S, 50265] logits never materialize.
"""

from typing import Any, Literal

import flax.linen as nn
import jax.numpy as jnp

from . import LanguageModelClass, ModelBundle, RobertaT, SchedulerType
from .layers import Mlp, SelfAttention, make_stack

HIDDEN = 1024
LAYERS = 24
HEADS = 16
FFN = 4096
VOCAB = 50265
MAX_POS = 512
LN_EPS = 1e-5


class RobertaBlock(nn.Module):
    """Post-LN encoder block (BERT convention: sublayer -> add -> norm)."""

    attn_impl: str = "xla"
    dropout: float = 0.1
    deterministic: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        deterministic = self.deterministic
        attn = SelfAttention(
            num_heads=HEADS, head_dim=HIDDEN // HEADS, causal=False, attn_impl=self.attn_impl, dtype=self.dtype, name="attn"
        )(x)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_attn")(x + attn)
        mlp = Mlp(intermediate=FFN, dropout=self.dropout, dtype=self.dtype, name="mlp")(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_mlp")(x + mlp)
        return x, None


class RobertaMLM(nn.Module):
    attn_impl: str = "xla"
    remat: bool = False
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, labels=None, deterministic=True):
        from ..ops.xent import lm_head_loss

        word_emb = self.param("word_embeddings", nn.initializers.normal(0.02), (VOCAB, HIDDEN))
        pos_emb = self.param("position_embeddings", nn.initializers.normal(0.02), (MAX_POS, HIDDEN))
        s = input_ids.shape[1]
        x = jnp.take(word_emb, input_ids, axis=0).astype(self.dtype) + pos_emb[None, :s].astype(self.dtype)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="emb_ln")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        stack = make_stack(
            RobertaBlock,
            LAYERS,
            remat=self.remat,
            attn_impl=self.attn_impl,
            dropout=self.dropout,
            deterministic=deterministic,
            dtype=self.dtype,
        )
        x, _ = stack(x, None)

        # MLM head: dense + gelu + LN, decoder tied to word embeddings
        x = nn.Dense(HIDDEN, dtype=self.dtype, name="mlm_dense")(x)
        x = nn.gelu(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="mlm_ln")(x)
        bias = self.param("mlm_bias", nn.initializers.zeros, (VOCAB,))
        kernel = word_emb.T.astype(self.dtype)
        if labels is None:
            return jnp.dot(x, kernel) + bias.astype(self.dtype)
        return lm_head_loss(x, kernel, labels, shift=False, bias=bias)


ROBERTA_TP_RULES = [
    (r"attn/qkv/kernel", ("data", "model")),
    (r"attn/out/kernel", ("model", "data")),
    (r"mlp/up/kernel", ("data", "model")),
    (r"mlp/down/kernel", ("model", "data")),
    (r"word_embeddings", (None, "model")),
]


class RobertaModelClass(LanguageModelClass[RobertaT]):
    def build_model(
        self, use_custom_kernels: bool = True, activation_checkpointing: bool = False, compute_dtype=None
    ) -> ModelBundle:
        from ..ops.attention import default_attn_impl

        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if self.mixed_precision else jnp.float32
        # reference builds roberta with attn_implementation="eager" always
        # (src/models/roberta.py:16); we still honor the kernel toggle
        module = RobertaMLM(
            attn_impl=default_attn_impl(use_custom_kernels), remat=activation_checkpointing, dtype=compute_dtype
        )

        def init_fn(rng):
            return module.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]

        def loss_fn(params, batch, rng=None, train=True):
            rngs = {"dropout": rng} if (train and rng is not None) else None
            loss = module.apply(
                {"params": params}, batch["input_ids"], labels=batch["labels"], deterministic=not train, rngs=rngs
            )
            return loss, {"loss": loss}

        return ModelBundle(init_fn=init_fn, loss_fn=loss_fn, tp_rules=ROBERTA_TP_RULES)

    @property
    def batch_size(self) -> int:
        return 8192

    @property
    def training_steps(self) -> int:
        return 500000

    @property
    def mixed_precision(self) -> Literal[None, "bf16", "fp16"]:
        return "fp16"

    @property
    def optimizer(self) -> Literal["adam", "adamw"]:
        return "adam"

    @property
    def optimizer_kwargs(self) -> dict[str, Any]:
        return {"lr": 4e-4, "betas": (0.9, 0.98), "weight_decay": 0.01}

    @property
    def scheduler_type(self) -> SchedulerType:
        return SchedulerType.LINEAR

    @property
    def scheduler_kwargs(self) -> dict[str, Any]:
        return {"num_warmup_steps": 30_000}

    @property
    def max_grad_norm(self) -> float:
        return 0.0

    @property
    def fsdp_layers_to_wrap(self) -> list[str]:
        return ["RobertaBlock"]

    @property
    def vocab_size(self) -> int:
        return VOCAB

    @property
    def sequence_length(self) -> int:
        return 512
