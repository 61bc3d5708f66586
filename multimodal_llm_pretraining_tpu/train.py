"""Training-config core: one declarative plan -> one jitted sharded step.

This is the TPU-native replacement for the reference's ``TrainingClass``
(``src/train.py:16-215``), which maps an abstract method config onto HF
``TrainingArguments`` + DeepSpeed JSON + FSDP options. Here the same knobs
configure a single GSPMD ``train_step``:

reference knob                      -> TPU mechanism
-----------------------------------------------------------------------
bf16 / fp16 (``src/train.py:22-23``)   bf16 compute dtype (fp32 master params;
                                       no loss scaler -- TPUs have no fp16)
tf32 (``:24``)                         matmul_precision="high" (bf16_3x passes)
                                       vs "highest" (fp32 emulation) for fp32
                                       models; no-op under bf16 compute
compile (``:25``)                      jit is always on (XLA); the flag keeps
                                       the search-space shape and toggles the
                                       persistent compilation cache
gradient_checkpointing (``:21``)       nn.remat on the layer stacks
fsdp_sharding / zero_stage (``:32-40``) ShardingPolicy -> partition specs for
                                       params / grads / optimizer state
offloading (``:39,203-213``)           optimizer state (and optionally params)
                                       placed with memory_kind="pinned_host"
micro batch x grad accum (``:19-20``)  lax.scan over microbatches in-step
optimizer/scheduler (``:27-30``)       optax chain (see training/optimizer.py)
"""

import os
from dataclasses import dataclass, field
from typing import Any, Literal

from .models import OptimizerT, SchedulerType
from .parallel.mesh import MeshConfig
from .parallel.sharding import ShardingMethodT, ShardingPolicy

MatmulPrecisionT = Literal["default", "high", "highest"]

# FSDP sharding names kept for search-space parity (src/train.py:32-34).
FsdpShardingT = Literal["no_shard", "shard_grad_op", "full_shard", "hybrid_shard_zero2", "hybrid_shard"]
ZeroStageT = Literal["0", "1", "2", "3", "3++"]


@dataclass
class TrainingPlan:
    num_training_steps: int
    micro_batch_size: int  # per-device, like per_device_train_batch_size
    gradient_accumulation_steps: int

    activation_checkpointing: bool = False
    # "flash" = full remat keeping flash-attn residuals (HF gradient_checkpointing
    # parity, max memory savings); "dots" = save all matmul outputs, recompute only
    # elementwise ops (near-free recompute, ~2.5x the activation memory of "flash")
    checkpoint_policy: Literal["flash", "dots"] = "flash"
    bf16: bool = False
    fp16: bool = False  # parity flag; executes as bf16 on TPU
    matmul_precision: MatmulPrecisionT = "highest"
    compile: bool = False  # persistent-compile-cache toggle (jit always on)
    use_custom_kernels: bool = True

    optimizer: OptimizerT = "adamw"
    optimizer_kwargs: dict[str, Any] = field(default_factory=dict)
    scheduler_type: SchedulerType = SchedulerType.LINEAR
    scheduler_kwargs: dict[str, Any] = field(default_factory=dict)

    sharding: ShardingMethodT = ""
    offloading: bool = False
    # Gradient-accumulator dtype override (DeepSpeed bf16-mode
    # ``grad_accum_dtype`` analog). None = automatic: f32 under master
    # offload (summing across microbatches must not round), else the param
    # dtype. "bf16" halves the accumulator -- the knob that lets mamba-2.8b
    # (11.2 GB of f32 grads otherwise) fit on a 16 GB chip.
    grad_accum_dtype: Literal["bf16", "f32", None] = None
    # Optimizer-moment dtype. None = f32 (optax default). "bf16" halves
    # mu+nu HBM (math still f32 per step; see optimizer.fused_adam_lowp)
    # -- the on-device alternative to host-offloading the moments.
    opt_state_dtype: Literal["bf16", "f32", None] = None
    # Store the live model copy in the compute dtype (bf16) so the backward
    # emits native-bf16 grads (an f32 param tree costs a params-sized f32
    # grad allocation per microbatch):
    #   True / "device": f32 master rides in opt_state ON DEVICE. With
    #     opt_state_dtype="bf16" the entire optimizer state fits next to
    #     pythia-1b on one 16 GB chip -- no host offload round-trip.
    #   "sr": NO master at all -- the update applies to the bf16 params with
    #     unbiased stochastic rounding (optimizer.stochastic_round_to),
    #     freeing another params-worth of f32 (4 GB at 1b). Zero-mean
    #     rounding noise; trajectory tracks the f32-master path in
    #     expectation (tests/test_train_step.py).
    master_weights: bool | Literal["device", "sr"] = False
    # Fully unroll the layer-stack scan: same stacked params, no XLA
    # while-loop, so the backward's layer-grad accumulation aliases in place
    # instead of holding a loop carry + output pair (2x the grad tree).
    # Slower compiles; the lever that fits pythia-2.8b on one 16 GB chip.
    unroll_layers: bool = False

    max_grad_norm: float = 1.0
    extra_args: dict[str, Any] = field(default_factory=dict)

    mesh: MeshConfig = field(default_factory=MeshConfig)

    def is_valid(self) -> bool:
        """Same spirit as ``TrainingClass.is_valid`` (``src/train.py:45-55``)."""
        policy_ok = True
        try:
            self.sharding_policy()
        except KeyError:
            policy_ok = False
        return not (
            self.num_training_steps <= 0
            or self.micro_batch_size <= 0
            or self.gradient_accumulation_steps <= 0
            or (self.bf16 and self.fp16)
            or not policy_ok
            # hybrid sharding needs a real replica axis
            or (self.sharding_policy().hybrid and self.mesh.num_hosts <= 1)
            # offloading requires sharding (src/train.py:52-54 analog)
            or (self.offloading and self.sharding == "")
        )

    def sharding_policy(self) -> ShardingPolicy:
        return ShardingPolicy.from_method(self.sharding, self.offloading)

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if (self.bf16 or self.fp16) else jnp.float32

    def mesh_config(self) -> MeshConfig:
        policy = self.sharding_policy()
        return MeshConfig(
            num_hosts=self.mesh.num_hosts,
            chips_per_host=self.mesh.chips_per_host,
            hybrid=policy.hybrid and self.mesh.num_hosts > 1,
            tensor_parallel=self.mesh.tensor_parallel,
        )

    def configure_compilation_cache(self) -> None:
        """The torch.compile/inductor-cache analog (``.env:15-16``): a
        persistent XLA compilation cache keyed by HLO."""
        if not self.compile:
            return
        import jax

        cache_dir = os.environ.get("MLPT_COMPILE_CACHE_DIR", os.path.expanduser("~/.cache/mlpt/xla_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception:
            pass

    def build_session(self, model_class, mesh=None, devices=None):
        """Materialize the jitted train/benchmark functions for this plan."""
        from .training.step import TrainSession

        return TrainSession(self, model_class, mesh=mesh, devices=devices)
