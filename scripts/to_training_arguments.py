"""Export a TrainingConfig + batch settings as a TrainingArguments JSON file
(parity: ``/root/reference/scripts/to_training_arguments.py``). The JSON is
consumed by ``scripts/training.py``."""

import argparse
import json
import sys

sys.path.insert(0, ".")

from multimodal_llm_pretraining_tpu.experiments.config import TrainingConfig
from multimodal_llm_pretraining_tpu.models import MODEL_TYPES
from multimodal_llm_pretraining_tpu.tpus import TPU_TYPES


def plan_to_arguments_dict(config: TrainingConfig, micro_batch_size: int, gradient_accumulation_steps: int) -> dict:
    plan = config.training_plan(
        micro_batch_size=micro_batch_size,
        gradient_accumulation_steps=gradient_accumulation_steps,
    )
    return {
        "model": config.model,
        "num_hosts": config.num_hosts,
        "chips_per_host": config.chips_per_host,
        "tpu_type": config.tpu_type,
        "tensor_parallel": config.tensor_parallel,
        "num_training_steps": plan.num_training_steps,
        "micro_batch_size": plan.micro_batch_size,
        "gradient_accumulation_steps": plan.gradient_accumulation_steps,
        "activation_checkpointing": plan.activation_checkpointing,
        "bf16": plan.bf16,
        "fp16": plan.fp16,
        "matmul_precision": plan.matmul_precision,
        "compile": plan.compile,
        "use_custom_kernels": plan.use_custom_kernels,
        "optimizer": plan.optimizer,
        "optimizer_kwargs": plan.optimizer_kwargs,
        "scheduler_type": plan.scheduler_type.value,
        "scheduler_kwargs": plan.scheduler_kwargs,
        "sharding": plan.sharding,
        "offloading": plan.offloading,
        "checkpoint_policy": plan.checkpoint_policy,
        "grad_accum_dtype": plan.grad_accum_dtype,
        "opt_state_dtype": plan.opt_state_dtype,
        "master_weights": plan.master_weights,
        "unroll_layers": plan.unroll_layers,
        "max_grad_norm": plan.max_grad_norm,
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-hosts", type=int, required=True)
    p.add_argument("--chips-per-host", type=int, required=True)
    p.add_argument("--tpu-type", choices=TPU_TYPES, required=True)
    p.add_argument("--model", choices=MODEL_TYPES, required=True)
    p.add_argument("--free-lunch", action="store_true")
    p.add_argument("--activation-checkpointing", action="store_true")
    p.add_argument("--sharding", default="")
    p.add_argument("--offloading", action="store_true")
    p.add_argument("--checkpoint-policy", default="flash", choices=["flash", "dots"])
    p.add_argument("--state-layout", default="", choices=["", "bf16_master", "bf16_sr"])
    p.add_argument("--unroll-layers", action="store_true")
    p.add_argument("--tensor-parallel", type=int, default=1)
    p.add_argument("--micro-batch-size", type=int, required=True)
    p.add_argument("--gradient-accumulation-steps", type=int, required=True)
    p.add_argument("--output-file", required=True)
    a = p.parse_args()
    config = TrainingConfig(
        num_hosts=a.num_hosts,
        chips_per_host=a.chips_per_host,
        tpu_type=a.tpu_type,
        model=a.model,
        free_lunch=a.free_lunch,
        activation_checkpointing=a.activation_checkpointing,
        sharding=a.sharding,
        offloading=a.offloading,
        checkpoint_policy=a.checkpoint_policy,
        state_layout=a.state_layout,
        unroll_layers=a.unroll_layers,
        tensor_parallel=a.tensor_parallel,
    )
    args = plan_to_arguments_dict(config, a.micro_batch_size, a.gradient_accumulation_steps)
    with open(a.output_file, "w") as f:
        json.dump(args, f, indent=2)
    print(f"wrote {a.output_file}")


if __name__ == "__main__":
    main()
