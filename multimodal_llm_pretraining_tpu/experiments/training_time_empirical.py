"""Empirical training-time experiment.

Parity with ``experiments/training_time_empirical.py``: a 3-step cached DAG
  max_micro_batch_size -> benchmarking_results -> training_days
with the same validity predicate, halving-retry-on-OOM loop, and
compile-fallback, rebuilt on the TPU primitives (AOT memory probing instead
of CUDA OOM catching).
"""

import math
from dataclasses import dataclass
from typing import Any, TypedDict

from ..benchmarking.max_batch_size import find_max_mbs_pow2
from ..benchmarking.step_time import estimate_step_time
from ..benchmarking.utils import BenchmarkHarness, OutOfMemory
from ..tpus import device_hbm_bytes
from ..utils import get_logger
from .base_classes import Experiment
from .config import TrainingConfig
from .distribute import distribute
from .cache import step
from .slurm import SlurmJob

logger = get_logger()


def build_benchmarking_harness(config: TrainingConfig, disable_compile: bool = False) -> BenchmarkHarness:
    """``build_benchmarking_trainer`` analog (reference ``:17-40``)."""
    plan = config.training_plan(
        num_training_steps=1,
        micro_batch_size=1,
        gradient_accumulation_steps=1,
    )
    if plan.compile and disable_compile:
        import dataclasses

        plan = dataclasses.replace(plan, compile=False)
    harness = BenchmarkHarness(plan, config.model_class())
    harness.setup()
    return harness


def find_largest_batch_size_worker(config: TrainingConfig, limit: int) -> int:
    try:
        harness = build_benchmarking_harness(config, disable_compile=True)
    except OutOfMemory:
        return 0
    return find_max_mbs_pow2(harness, limit=limit, hbm_budget_bytes=device_hbm_bytes(config.tpu_type))


@step(cacheable=True, version="002")
def find_largest_batch_size(config: TrainingConfig, limit: int) -> int:
    return distribute(
        func=find_largest_batch_size_worker,
        func_kwargs={"config": config, "limit": limit},
        workers_per_host=config.chips_per_host,
    )


class BenchmarkingResults(TypedDict):
    micro_batch_size: int
    step_time: float
    compile_disabled: bool


def benchmark_step_time_worker(
    config: TrainingConfig,
    disable_compile: bool,
    micro_batch_size: int,
    target_micro_batch_size: int,
    num_benchmarking_steps: int,
) -> BenchmarkingResults | None:
    try:
        harness = build_benchmarking_harness(config, disable_compile=disable_compile)
        step_time = estimate_step_time(harness, micro_batch_size, target_micro_batch_size, num_benchmarking_steps)
        return BenchmarkingResults(micro_batch_size=micro_batch_size, step_time=step_time, compile_disabled=disable_compile)
    except OutOfMemory:
        return None


@step(cacheable=True, version="002")
def benchmark_step_time(
    config: TrainingConfig,
    max_micro_batch_size: int,
    target_micro_batch_size: int,
    num_benchmarking_steps: int,
    trial: int = 0,
) -> BenchmarkingResults | None:
    micro_batch_size = max_micro_batch_size

    while micro_batch_size > 0:
        try:
            results = distribute(
                func=benchmark_step_time_worker,
                func_kwargs=dict(
                    config=config,
                    disable_compile=False,
                    micro_batch_size=micro_batch_size,
                    target_micro_batch_size=target_micro_batch_size,
                    num_benchmarking_steps=num_benchmarking_steps,
                ),
                workers_per_host=config.chips_per_host,
            )
        except RuntimeError:
            # reference retries without torch.compile on suspected compile
            # timeouts (:108-123); the analog disables the persistent cache
            # and Pallas kernels in case a kernel fails to lower
            if config.free_lunch:
                logger.info("benchmark failed under custom kernels; retrying with plain XLA lowering")
                results = distribute(
                    func=benchmark_step_time_worker,
                    func_kwargs=dict(
                        config=config,
                        disable_compile=True,
                        micro_batch_size=micro_batch_size,
                        target_micro_batch_size=target_micro_batch_size,
                        num_benchmarking_steps=num_benchmarking_steps,
                    ),
                    workers_per_host=config.chips_per_host,
                )
            else:
                raise

        if results is not None:
            return results

        micro_batch_size //= 2

    return None


@step(cacheable=True, version="002")
def compute_training_days(benchmarking_results: BenchmarkingResults | None, num_steps: int) -> float | None:
    """Total training time in days (reference ``:133-138``)."""
    if benchmarking_results is None:
        return None
    return (num_steps * benchmarking_results["step_time"]) / (24 * 60 * 60)


@dataclass
class TrainingTimeEmpirical(Experiment):
    config: TrainingConfig = None  # type: ignore[assignment]
    benchmarking_steps: int = 3
    trial: int = 0

    def to_dict(self) -> dict[str, Any]:
        return {"trial": self.trial, **self.config.__dict__, "benchmarking_steps": self.benchmarking_steps}

    def __post_init__(self):
        self.model_cls = self.config.model_class()
        self.plan = self.config.training_plan()

    def is_valid(self) -> bool:
        """Validity predicate, rule-for-rule from reference ``:161-186``
        (the bf16-capability rule passes trivially on TPU)."""
        if any(
            [
                self.benchmarking_steps <= 0,
                self.trial < 0,
                # batch size evenly divisible by total chips
                self.model_cls.batch_size % self.config.num_chips > 0,
                # per-chip batch must be a power of two
                not math.log2(self.model_cls.batch_size // self.config.num_chips).is_integer(),
                self.config.activation_checkpointing and not self.model_cls.supports_activation_checkpointing,
                self.model_cls.mixed_precision == "bf16" and not self.config.supports_bf16(),
                # no sharding on a single chip (no-op) unless offloading
                self.config.num_chips == 1 and self.config.sharding != "" and not self.config.offloading,
                # offloading requires sharding
                self.config.offloading and self.config.sharding == "",
                # hybrid methods need >1 host
                "hybrid" in self.config.sharding and self.config.num_hosts <= 1,
                "3++" in self.config.sharding and self.config.num_hosts <= 1,
                # tensor parallel must divide the chips
                self.config.num_chips % self.config.tensor_parallel != 0,
            ]
        ):
            return False
        return self.plan.is_valid()

    @property
    def target_micro_batch_size(self) -> int:
        return self.model_cls.batch_size // self.config.num_chips

    @property
    def step_dict(self):
        steps = {}
        steps["max_micro_batch_size"] = find_largest_batch_size(config=self.config, limit=self.target_micro_batch_size)
        steps["benchmarking_results"] = benchmark_step_time(
            config=self.config,
            max_micro_batch_size=steps["max_micro_batch_size"],
            target_micro_batch_size=self.target_micro_batch_size,
            num_benchmarking_steps=self.benchmarking_steps,
            trial=self.trial,
        )
        steps["training_days"] = compute_training_days(
            benchmarking_results=steps["benchmarking_results"],
            num_steps=self.model_cls.training_steps,
        )
        return steps

    @property
    def slurm_job(self) -> SlurmJob | None:
        return SlurmJob(
            time_min=60,
            num_hosts=self.config.num_hosts,
            mem_per_host_gb=64 * self.config.chips_per_host,
            cpus_per_host=4 * self.config.chips_per_host,
            tpu_type=self.config.tpu_type,
        )

    def results(self):
        return {
            "max_micro_batch_size": self.step_result("max_micro_batch_size"),
            **(self.step_result("benchmarking_results") or {}),
            "training_days": self.step_result("training_days"),
        }


if __name__ == "__main__":
    TrainingTimeEmpirical.cli()
