"""Mamba-2.8b causal LM.

Reimplements the reference's ``MambaForCausalLM`` workload
(``src/models/mamba.py:15-85``): the state-spaces/mamba-2.8b architecture --
d_model 2560, 64 layers, expand 2 (d_inner 5120), d_state 16, d_conv 4,
dt_rank 160, vocab 50280, seq 4096. Recipe: batch 128, 572,204 steps, bf16,
AdamW lr 8e-4 (5x 1.6e-4) wd 0.1, cosine-to-1e-5 with 10% warmup.

The CUDA selective-scan/causal-conv fast path becomes
``ops/selective_scan.py`` (chunked associative scan; the
``use_custom_kernels`` toggle selects chunked vs full-length scan, the
``is_fast_path_available`` analog). Unlike the reference
(``supports_compilation=False`` because torch.compile broke on Mamba), the
scan jits fine, so ``supports_compilation`` stays True.
"""

import math
from typing import Any, Literal

import flax.linen as nn
import jax.numpy as jnp

from . import LanguageModelClass, MambaT, ModelBundle, SchedulerType
from .layers import make_stack

D_MODEL = 2560
N_LAYER = 64
D_STATE = 16
D_CONV = 4
EXPAND = 2
D_INNER = EXPAND * D_MODEL  # 5120
DT_RANK = math.ceil(D_MODEL / 16)  # 160
VOCAB = 50280
LN_EPS = 1e-5


class MambaBlock(nn.Module):
    use_custom_kernels: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        from ..ops.selective_scan import causal_conv1d, selective_scan

        residual = x
        x = nn.RMSNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)

        xz = nn.Dense(2 * D_INNER, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        u, z = jnp.split(xz, 2, axis=-1)

        conv_w = self.param("conv_weight", nn.initializers.lecun_normal(), (D_CONV, D_INNER))
        conv_b = self.param("conv_bias", nn.initializers.zeros, (D_INNER,))
        u = causal_conv1d(u, conv_w.astype(self.dtype), conv_b.astype(self.dtype))
        u = nn.silu(u)

        x_dbc = nn.Dense(DT_RANK + 2 * D_STATE, use_bias=False, dtype=self.dtype, name="x_proj")(u)
        dt, B, C = jnp.split(x_dbc, [DT_RANK, DT_RANK + D_STATE], axis=-1)
        dt = nn.Dense(D_INNER, dtype=self.dtype, name="dt_proj")(dt)
        delta = nn.softplus(dt)

        A_log = self.param(
            "A_log", lambda rng, shape: jnp.log(jnp.broadcast_to(jnp.arange(1, D_STATE + 1, dtype=jnp.float32), shape)), (D_INNER, D_STATE)
        )
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (D_INNER,))

        y = selective_scan(u, delta, A, B, C, D, use_custom_kernels=self.use_custom_kernels)
        y = y * nn.silu(z)
        out = nn.Dense(D_MODEL, use_bias=False, dtype=self.dtype, name="out_proj")(y)
        return residual + out, None


class MambaLM(nn.Module):
    use_custom_kernels: bool = True
    remat: bool = False
    unroll_layers: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, labels=None, deterministic=True):
        from ..ops.xent import lm_head_loss

        embed = self.param("embedding", nn.initializers.normal(0.02), (VOCAB, D_MODEL))
        x = jnp.take(embed, input_ids, axis=0).astype(self.dtype)
        stack = make_stack(
            MambaBlock,
            N_LAYER,
            remat=self.remat,
            unroll=self.unroll_layers,
            use_custom_kernels=self.use_custom_kernels,
            dtype=self.dtype,
        )
        x, _ = stack(x, None)
        x = nn.RMSNorm(epsilon=LN_EPS, dtype=self.dtype, name="final_norm")(x)
        kernel = embed.T.astype(self.dtype)  # tied LM head (HF Mamba ties)
        if labels is None:
            return jnp.dot(x, kernel)
        return lm_head_loss(x, kernel, labels, shift=True)


MAMBA_TP_RULES = [
    (r"in_proj/kernel", ("data", "model")),
    (r"out_proj/kernel", ("model", "data")),
    (r"embedding", (None, "model")),
]


class MambaModelClass(LanguageModelClass[MambaT]):
    def build_model(
        self,
        use_custom_kernels: bool = True,
        activation_checkpointing: bool = False,
        compute_dtype=None,
        unroll_layers: bool = False,
    ) -> ModelBundle:
        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if self.mixed_precision else jnp.float32
        module = MambaLM(
            use_custom_kernels=use_custom_kernels,
            remat=activation_checkpointing,
            unroll_layers=unroll_layers,
            dtype=compute_dtype,
        )

        def init_fn(rng):
            return module.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]

        def loss_fn(params, batch, rng=None, train=True):
            loss = module.apply({"params": params}, batch["input_ids"], labels=batch["labels"])
            return loss, {"loss": loss}

        return ModelBundle(init_fn=init_fn, loss_fn=loss_fn, tp_rules=MAMBA_TP_RULES)

    @property
    def supports_compilation(self) -> bool:
        return True  # XLA handles the scan fine (torch.compile could not)

    @property
    def batch_size(self) -> int:
        return 128

    @property
    def training_steps(self) -> int:
        return 572_204

    @property
    def mixed_precision(self) -> Literal[None, "bf16", "fp16"]:
        return "bf16"

    @property
    def optimizer(self) -> Literal["adam", "adamw"]:
        return "adamw"

    @property
    def optimizer_kwargs(self) -> dict[str, Any]:
        return {"lr": 1.6e-4 * 5, "weight_decay": 0.1, "betas": (0.9, 0.95)}

    @property
    def scheduler_type(self) -> SchedulerType:
        return SchedulerType.COSINE_WITH_MIN_LR

    @property
    def scheduler_kwargs(self) -> dict[str, Any]:
        return {"num_warmup_steps": int(0.1 * self.training_steps), "min_lr": 1e-5}

    @property
    def max_grad_norm(self) -> float:
        return 1.0

    @property
    def fsdp_layers_to_wrap(self) -> list[str]:
        return ["MambaBlock"]

    @property
    def vocab_size(self) -> int:
        # dummy-data vocab per reference (src/models/mamba.py:78-80); the
        # model's own embedding table is VOCAB=50280
        return 50265

    @property
    def sequence_length(self) -> int:
        return 4096
