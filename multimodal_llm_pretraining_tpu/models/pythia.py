"""Pythia suite: GPTNeoX causal LMs, 14M-12B.

TPU-native reimplementation of the reference's Pythia model class
(``src/models/pythia.py:14-98``), which instantiates HF ``GPTNeoXForCausalLM``
from the EleutherAI configs. Architecture facts (published Pythia suite):
parallel-residual blocks, rotary on 25% of head dims, untied output head,
vocab padded to 50304, seq 2049. Training recipe (batch 1024, 143k steps,
per-size LRs, Adam betas (0.9, 0.95), cosine-to-10% schedule) matches
``src/models/pythia.py:24-78`` exactly.
"""

from typing import Any, Literal

import flax.linen as nn
import jax.numpy as jnp

from . import LanguageModelClass, ModelBundle, PythiaT, SchedulerType
from .layers import Mlp, SelfAttention, make_stack

# (layers, hidden, heads) per published EleutherAI configs
PYTHIA_SIZES: dict[str, tuple[int, int, int]] = {
    "pythia-14m": (6, 128, 4),
    "pythia-31m": (6, 256, 8),
    "pythia-70m": (6, 512, 8),
    "pythia-160m": (12, 768, 12),
    "pythia-410m": (24, 1024, 16),
    "pythia-1b": (16, 2048, 8),
    "pythia-1.4b": (24, 2048, 16),
    "pythia-2.8b": (32, 2560, 32),
    "pythia-6.9b": (32, 4096, 32),
    "pythia-12b": (36, 5120, 40),
}

VOCAB_SIZE = 50304
ROTARY_PCT = 0.25


class GPTNeoXBlock(nn.Module):
    hidden: int
    num_heads: int
    attn_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        head_dim = self.hidden // self.num_heads
        # parallel residual: x + attn(ln1(x)) + mlp(ln2(x))
        a_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_attn")(x)
        attn = SelfAttention(
            num_heads=self.num_heads,
            head_dim=head_dim,
            causal=True,
            rotary_dim=int(head_dim * ROTARY_PCT),
            attn_impl=self.attn_impl,  # type: ignore[arg-type]
            use_bias=True,
            dtype=self.dtype,
            name="attn",
        )(a_in)
        m_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_mlp")(x)
        mlp = Mlp(intermediate=4 * self.hidden, dtype=self.dtype, name="mlp")(m_in)
        return x + attn + mlp, None


class GPTNeoXLM(nn.Module):
    num_layers: int
    hidden: int
    num_heads: int
    vocab_size: int = VOCAB_SIZE
    attn_impl: str = "xla"
    remat: bool = False
    checkpoint_policy: str = "flash"
    unroll_layers: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, labels=None, deterministic=True):
        """Returns logits when ``labels`` is None, else the (shifted) LM loss
        via the chunked vocab projection (full logits never materialize)."""
        from ..ops.xent import lm_head_loss

        x = nn.Embed(self.vocab_size, self.hidden, dtype=self.dtype, name="embed_in")(input_ids)
        stack = make_stack(
            GPTNeoXBlock,
            self.num_layers,
            remat=self.remat,
            checkpoint_policy=self.checkpoint_policy,
            unroll=self.unroll_layers,
            hidden=self.hidden,
            num_heads=self.num_heads,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
        )
        x, _ = stack(x, None)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_ln")(x)
        kernel = self.param("embed_out", nn.initializers.lecun_normal(), (self.hidden, self.vocab_size))
        if labels is None:
            return jnp.dot(x, kernel.astype(self.dtype))
        return lm_head_loss(x, kernel.astype(self.dtype), labels, shift=True)


# Tensor-parallel annotations (active only when the mesh has a model axis;
# specs right-align to array rank, so the scan layer dim is untouched).
GPTNEOX_TP_RULES = [
    (r"attn/qkv/kernel", ("data", "model")),
    (r"attn/out/kernel", ("model", "data")),
    (r"mlp/up/kernel", ("data", "model")),
    (r"mlp/down/kernel", ("model", "data")),
    (r"embed_out", (None, "model")),
    (r"embed_in/embedding", (None, "model")),
]


class PythiaModelClass(LanguageModelClass[PythiaT]):
    def build_model(
        self,
        use_custom_kernels: bool = True,
        activation_checkpointing: bool = False,
        compute_dtype=None,
        checkpoint_policy: str = "flash",
        unroll_layers: bool = False,
    ) -> ModelBundle:
        from ..ops.attention import default_attn_impl

        num_layers, hidden, heads = PYTHIA_SIZES[self.model_type]
        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if self.mixed_precision else jnp.float32
        module = GPTNeoXLM(
            num_layers=num_layers,
            hidden=hidden,
            num_heads=heads,
            attn_impl=default_attn_impl(use_custom_kernels),
            remat=activation_checkpointing,
            checkpoint_policy=checkpoint_policy,
            unroll_layers=unroll_layers,
            dtype=compute_dtype,
        )

        def init_fn(rng):
            return module.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]

        def loss_fn(params, batch, rng=None, train=True):
            loss = module.apply({"params": params}, batch["input_ids"], labels=batch["labels"])
            return loss, {"loss": loss}

        return ModelBundle(init_fn=init_fn, loss_fn=loss_fn, tp_rules=GPTNEOX_TP_RULES)

    @property
    def batch_size(self) -> int:
        return 1024

    @property
    def training_steps(self) -> int:
        return 143000

    @property
    def mixed_precision(self) -> Literal[None, "bf16", "fp16"]:
        # Pythia trained fp16 except 1b (bf16); both run bf16 on TPU.
        if self.model_type == "pythia-1b":
            return "bf16"
        return "fp16"

    @property
    def optimizer(self) -> Literal["adam", "adamw"]:
        return "adam"

    @property
    def optimizer_kwargs(self) -> dict[str, Any]:
        lr = {
            "pythia-14m": 1.0e-3,
            "pythia-31m": 1.0e-3,
            "pythia-70m": 1.0e-3,
            "pythia-160m": 6.0e-4,
            "pythia-410m": 3.0e-4,
            "pythia-1b": 3.0e-4,
            "pythia-1.4b": 2.0e-4,
            "pythia-2.8b": 1.6e-4,
            "pythia-6.9b": 1.2e-4,
            "pythia-12b": 1.2e-4,
        }[self.model_type]
        return {"lr": lr, "betas": (0.9, 0.95), "eps": 1e-8, "weight_decay": 0.01}

    @property
    def scheduler_type(self) -> SchedulerType:
        return SchedulerType.COSINE_WITH_MIN_LR

    @property
    def scheduler_kwargs(self) -> dict[str, Any]:
        return {"num_warmup_steps": int(0.01 * self.training_steps), "min_lr_rate": 0.1}

    @property
    def max_grad_norm(self) -> float:
        return 1.0

    @property
    def fsdp_layers_to_wrap(self) -> list[str]:
        return ["GPTNeoXBlock"]

    @property
    def vocab_size(self) -> int:
        return VOCAB_SIZE

    @property
    def sequence_length(self) -> int:
        return 2049
