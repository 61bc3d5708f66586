"""Pick the fastest benchmarked method config (parity:
``/root/reference/scripts/print_optimal_config.py``).

Reads cached sweep results, drops failed combos, sorts by projected
training_days, and derives gradient_accumulation_steps so that
num_chips * micro_batch_size * grad_acc == model batch size.
"""

import argparse
import sys

sys.path.insert(0, ".")

import pandas as pd

from multimodal_llm_pretraining_tpu.experiments.sweeps import TrainingTimeEmpiricalSweep
from multimodal_llm_pretraining_tpu.models import MODEL_TYPES, get_model_class
from multimodal_llm_pretraining_tpu.tpus import TPU_TYPES


def full_search_space(num_hosts, chips_per_host, tpu_type, model):
    return dict(
        num_hosts=[num_hosts],
        chips_per_host=[chips_per_host],
        tpu_type=[tpu_type],
        model=[model],
        free_lunch=[False, True],
        activation_checkpointing=[False, True],
        checkpoint_policy=["flash", "dots"],
        sharding=["", "zero_1", "zero_2", "zero_3", "fsdp_shard_grad_op", "fsdp_full_shard"],
        offloading=[False, True],
        state_layout=["", "bf16_master", "bf16_sr"],
        unroll_layers=[False, True],
    )


def optimal_config(num_hosts: int, chips_per_host: int, tpu_type: str, model: str) -> pd.DataFrame:
    sweep = TrainingTimeEmpiricalSweep(search_space=full_search_space(num_hosts, chips_per_host, tpu_type, model))
    df = sweep.results()
    if "training_days" not in df.columns:
        raise SystemExit("no cached results found -- run scripts/benchmark.py first")
    df = df[df["training_days"].notna()].sort_values("training_days")
    if df.empty:
        raise SystemExit("no successful results found")
    model_class = get_model_class(model)  # type: ignore[arg-type]
    num_chips = num_hosts * chips_per_host
    df = df.assign(
        gradient_accumulation_steps=lambda d: model_class.batch_size // (d["micro_batch_size"].astype(int) * num_chips)
    )
    return df


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-hosts", type=int, required=True)
    p.add_argument("--chips-per-host", type=int, required=True)
    p.add_argument("--tpu-type", choices=TPU_TYPES, required=True)
    p.add_argument("--model", choices=MODEL_TYPES, required=True)
    p.add_argument("--top", type=int, default=10)
    a = p.parse_args()
    df = optimal_config(a.num_hosts, a.chips_per_host, a.tpu_type, a.model)
    cols = [c for c in ["free_lunch", "activation_checkpointing", "checkpoint_policy", "sharding", "offloading", "state_layout", "unroll_layers", "micro_batch_size", "gradient_accumulation_steps", "step_time", "training_days"] if c in df.columns]
    with pd.option_context("display.max_rows", None, "display.width", 200):
        print(df[cols].head(a.top).to_string(index=False))


if __name__ == "__main__":
    main()
