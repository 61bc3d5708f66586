"""Chip-days vs the original papers' reported pretraining resources
(parity: plotting/gpu_days.py:54-73, which compares against each model
paper's GPU allocation)."""

import sys

sys.path.insert(0, ".")

from . import load_results, standard_cli

# original-paper pretraining resources: (num_devices, days) per model
# (reference plotting/gpu_days.py:54-73)
ORIGINAL_RESOURCES = {
    "pythia-160m": (32, 1),
    "pythia-410m": (32, 3),
    "pythia-1b": (64, 3),
    "pythia-2.8b": (64, 9),
    "pythia-6.9b": (128, 10),
    "roberta": (1024, 1),
    "convnext-xlarge-22k": (128, 3),
    "vit": (8, 30),
}


def tpu_days(num_hosts, chips_per_host, tpu_type, model, output=None):
    df = load_results(num_hosts, chips_per_host, tpu_type, model)
    if df.empty:
        print("no cached results; run scripts/benchmark.py first")
        return
    chips = num_hosts * chips_per_host
    best = df.sort_values("training_days").iloc[0]
    ours = best["training_days"] * chips
    print(f"{model}: best method '{best['method']}' -> {best['training_days']:.2f} days on {chips} {tpu_type} chips = {ours:.1f} chip-days")
    if model in ORIGINAL_RESOURCES:
        n, d = ORIGINAL_RESOURCES[model]
        print(f"original paper: {n} devices x {d} days = {n * d} device-days")
        print(f"ratio (ours/original): {ours / (n * d):.2f}x")


if __name__ == "__main__":
    standard_cli(tpu_days)
