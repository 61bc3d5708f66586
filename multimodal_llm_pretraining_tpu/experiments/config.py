"""Experiment configuration dataclasses.

Mirrors ``experiments/config.py:12-101``: ``BaseConfig`` names the hardware
(TPU topology instead of GPU counts) and model; ``TrainingConfig`` adds the
method-search dimensions and expands them into a concrete ``TrainingPlan``
(the ``TrainingConfig.training_class`` analog).

Free-lunch mapping (reference ``experiments/config.py:41-48``):
  GPU free lunch = TF32 (ampere+) + torch.compile + custom kernels
  TPU free lunch = matmul precision "high" (bf16_3x, the TF32 analog; every
  TPU qualifies, so the ampere gate always passes) + persistent compile
  cache + Pallas kernels
"""

import dataclasses
from dataclasses import dataclass
from typing import Literal

from ..models import BaseModelClass, ModelT, get_model_class
from ..parallel.mesh import MeshConfig
from ..tpus import TpuT, supports_bf16
from ..train import TrainingPlan

ShardingT = Literal[
    "",
    "fsdp_shard_grad_op",
    "fsdp_full_shard",
    "fsdp_hybrid_shard_zero2",
    "fsdp_hybrid_shard",
    "zero_1",
    "zero_2",
    "zero_3",
    "zero_3++",
]


@dataclass
class BaseConfig:
    num_hosts: int
    chips_per_host: int
    tpu_type: TpuT
    model: ModelT

    @property
    def num_chips(self) -> int:
        return self.num_hosts * self.chips_per_host

    def supports_bf16(self) -> bool:
        """ampere_or_newer_gpu analog -- always True on TPU."""
        return supports_bf16(self.tpu_type)

    def model_class(self) -> BaseModelClass:
        return get_model_class(model_type=self.model)

    def config_hash(self) -> str:
        return repr(self)


@dataclass
class TrainingConfig(BaseConfig):
    free_lunch: bool = False
    activation_checkpointing: bool = False
    # TPU value-add search axis: which residuals remat keeps. "flash" = HF
    # gradient_checkpointing parity (recompute everything but flash-attn
    # residuals, max memory savings); "dots" = save all matmul outputs
    # (~25% faster step when the batch still fits). Only meaningful with
    # activation_checkpointing; the sweep validity rule dedupes otherwise.
    # cache_omit_default: adding this knob must not re-key already-measured
    # arms (experiments/cache.stable_repr).
    checkpoint_policy: Literal["flash", "dots"] = dataclasses.field(
        default="flash", metadata={"cache_omit_default": True}
    )
    sharding: ShardingT = ""
    offloading: bool = False
    tensor_parallel: int = 1  # TPU value-add: GSPMD model axis (reference has no TP)
    # Search dimensions the headline recipe needs (round-2 verdict #2): these
    # change feasibility (grad_accum_dtype=bf16 is the only way a 2.8b model's
    # accumulators fit next to bf16 params on 16 GB) and rank (matmul
    # precision ladder). "" = plan default; cache_omit_default keeps old arms.
    grad_accum_dtype: Literal["", "bf16", "f32"] = dataclasses.field(
        default="", metadata={"cache_omit_default": True}
    )
    unroll_layers: bool = dataclasses.field(default=False, metadata={"cache_omit_default": True})
    matmul_precision: Literal["", "default", "high", "highest"] = dataclasses.field(
        default="", metadata={"cache_omit_default": True}
    )
    # Composite state-layout axis (round-3 headline recipe): where the
    # optimizer state lives and at what precision.
    #   ""            -> f32 state (offload rules apply as before)
    #   "bf16_master" -> bf16 live params + bf16 moments + on-device f32
    #                    master (master_weights="device")
    #   "bf16_sr"     -> masterless: bf16 params updated with stochastic
    #                    rounding + bf16 moments + bf16 grad accumulators --
    #                    the layout that fits pythia-1b's ENTIRE state on one
    #                    16 GB chip (57% MFU vs 51% with host offload)
    state_layout: Literal["", "bf16_master", "bf16_sr"] = dataclasses.field(
        default="", metadata={"cache_omit_default": True}
    )

    def measurement_equivalent(self) -> "TrainingConfig":
        """Canonical representative of this config's single-chip measurement
        equivalence class.

        On one chip every sharding label expands to identical programs:
        ``fsdp_partition_spec`` only shards when the data axis is > 1, so
        "sharded" and "replicated" produce byte-identical PartitionSpecs, and
        the quantized-comms branch is gated on ``data > 1``. The only thing
        that changes the compiled step is the offload policy --
        ``(offload_optimizer, offload_params)``. zero_1 / zero_2 /
        fsdp_shard_grad_op + offload are therefore ONE measurement (opt-state
        offload), and zero_3 / fsdp_full_shard + offload another (opt+param
        offload). Benchmark steps key their cache on this canonical config so
        a method sweep times each distinct program once instead of once per
        label (~40 min of remote compiles per offload arm on this backend);
        every label still gets its own grid row, carrying the shared number.
        """
        if self.num_chips > 1 or not self.offloading or self.sharding == "":
            return self
        from ..parallel.sharding import ShardingPolicy

        policy = ShardingPolicy.from_method(self.sharding, offloading=True)
        canonical = "zero_3" if policy.offload_params else "zero_1"
        return dataclasses.replace(self, sharding=canonical)

    def training_plan(self, **overrides) -> TrainingPlan:
        model_class = self.model_class()

        # NOTE: for bf16-compute models "high" (bf16_3x) costs a measured
        # +3.4% step time on pythia-1b vs "default" (single-pass bf16, what
        # torch autocast runs with or without TF32) -- the `matmul_precision`
        # search dimension exposes the faster setting; flipping the DEFAULT
        # here requires re-measuring every committed grid consistently.
        if self.free_lunch:
            matmul_precision = "high" if self.supports_bf16() else "highest"
            compile = model_class.supports_compilation
            use_custom_kernels = True
        else:
            matmul_precision = "highest"
            compile = False
            use_custom_kernels = False
        if self.matmul_precision:
            matmul_precision = self.matmul_precision

        plan = TrainingPlan(
            num_training_steps=model_class.training_steps,
            micro_batch_size=1,
            gradient_accumulation_steps=1,
            activation_checkpointing=self.activation_checkpointing,
            checkpoint_policy=self.checkpoint_policy,
            bf16=(model_class.mixed_precision == "bf16"),
            fp16=(model_class.mixed_precision == "fp16"),
            matmul_precision=matmul_precision,  # type: ignore[arg-type]
            compile=compile,
            use_custom_kernels=use_custom_kernels,
            optimizer=model_class.optimizer,
            optimizer_kwargs=model_class.optimizer_kwargs,
            scheduler_type=model_class.scheduler_type,
            scheduler_kwargs=model_class.scheduler_kwargs,
            sharding=self.sharding,
            offloading=self.offloading,
            grad_accum_dtype=(self.grad_accum_dtype or ("bf16" if self.state_layout else None)),
            opt_state_dtype="bf16" if self.state_layout else None,
            master_weights={"bf16_master": "device", "bf16_sr": "sr"}.get(self.state_layout, False),
            unroll_layers=self.unroll_layers,
            max_grad_norm=model_class.max_grad_norm,
            extra_args=model_class.extra_training_args,
            mesh=MeshConfig(
                num_hosts=self.num_hosts,
                chips_per_host=self.chips_per_host,
                tensor_parallel=self.tensor_parallel,
            ),
        )
        return dataclasses.replace(plan, **overrides)
