"""Print the TrainingArguments JSON for a config to stdout (parity:
``/root/reference/scripts/print_huggingface_arguments.py``)."""

import argparse
import json
import sys

sys.path.insert(0, ".")

from multimodal_llm_pretraining_tpu.experiments.config import TrainingConfig
from to_training_arguments import plan_to_arguments_dict  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-hosts", type=int, required=True)
    p.add_argument("--chips-per-host", type=int, required=True)
    p.add_argument("--tpu-type", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--free-lunch", action="store_true")
    p.add_argument("--activation-checkpointing", action="store_true")
    p.add_argument("--sharding", default="")
    p.add_argument("--offloading", action="store_true")
    p.add_argument("--micro-batch-size", type=int, required=True)
    p.add_argument("--gradient-accumulation-steps", type=int, required=True)
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
    )
    print(json.dumps(plan_to_arguments_dict(config, a.micro_batch_size, a.gradient_accumulation_steps), indent=2))


if __name__ == "__main__":
    main()
