"""Analytic training-time estimate (parity: ``experiments/training_time_analytic.py``).

training_days = total_flops / (num_chips * peak_flops * 86400)

The per-GPU datasheet TFLOPS table (reference ``:24-47``) becomes the TPU
chip registry (``tpus.py``); the bf16-vs-TF32 split becomes bf16 vs fp32
matmul-precision peaks. Like the reference, this assumes 100% FLOPs
utilization -- it is an optimistic lower bound used to sanity-check the
empirical numbers (BASELINE.md north star: agreement within ~10% requires
multiplying by a realistic MFU; the ``assumed_mfu`` field exposes that knob,
default 1.0 for reference parity).
"""

from dataclasses import dataclass
from typing import Any

from ..tpus import peak_tflops
from .base_classes import Experiment
from .cache import step
from .config import BaseConfig, TrainingConfig
from .count_flops import training_flops


@step(cacheable=True, version="001")
def estimate_training_days_from_flops(
    total_flops: float,
    config: TrainingConfig,
    assumed_mfu: float = 1.0,
) -> float:
    model_class = config.model_class()
    if model_class.mixed_precision in ("bf16", "fp16"):
        peak = peak_tflops(config.tpu_type, "bf16")
    elif config.free_lunch:
        peak = peak_tflops(config.tpu_type, "fp32_high")  # TF32 analog
    else:
        peak = peak_tflops(config.tpu_type, "fp32_highest")
    flops_per_day = config.num_chips * peak * 1e12 * assumed_mfu * 86400
    return total_flops / flops_per_day


@dataclass
class TrainingTimeAnalytic(Experiment):
    config: TrainingConfig = None  # type: ignore[assignment]
    assumed_mfu: float = 1.0

    def to_dict(self) -> dict[str, Any]:
        return {**self.config.__dict__, "assumed_mfu": self.assumed_mfu}

    @property
    def dependencies(self):
        from .count_flops import CountFlopsExperiment

        base = BaseConfig(
            num_hosts=self.config.num_hosts,
            chips_per_host=self.config.chips_per_host,
            tpu_type=self.config.tpu_type,
            model=self.config.model,
        )
        return [CountFlopsExperiment(config=base)]

    @property
    def step_dict(self):
        base = BaseConfig(
            num_hosts=self.config.num_hosts,
            chips_per_host=self.config.chips_per_host,
            tpu_type=self.config.tpu_type,
            model=self.config.model,
        )
        flops = training_flops(config=base)
        return {
            "training_days": estimate_training_days_from_flops(
                total_flops=flops, config=self.config, assumed_mfu=self.assumed_mfu
            )
        }

    def results(self):
        return {"training_days": self.step_result("training_days")}


if __name__ == "__main__":
    TrainingTimeAnalytic.cli()
