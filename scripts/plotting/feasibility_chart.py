"""Feasibility heatmap (parity: plotting/feasibility_chart.py): which
(method, model) combinations fit in memory at all (training_days non-null)."""

import argparse
import sys

sys.path.insert(0, ".")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from multimodal_llm_pretraining_tpu.experiments.sweeps import TrainingTimeEmpiricalSweep


def feasibility(num_hosts, chips_per_host, tpu_type, models, output="feasibility.png"):
    methods = ["", "zero_1", "zero_2", "zero_3", "fsdp_shard_grad_op", "fsdp_full_shard"]
    grid = np.full((len(models), len(methods)), np.nan)
    for i, model in enumerate(models):
        sweep = TrainingTimeEmpiricalSweep(
            search_space=dict(
                num_hosts=[num_hosts],
                chips_per_host=[chips_per_host],
                tpu_type=[tpu_type],
                model=[model],
                free_lunch=[True],
                activation_checkpointing=[True],
                sharding=methods,
                offloading=[False],
            )
        )
        df = sweep.results()
        for j, m in enumerate(methods):
            rows = df[df.get("sharding", "") == m] if not df.empty else df
            if not rows.empty and "training_days" in rows and rows["training_days"].notna().any():
                grid[i, j] = 1.0
            elif not rows.empty:
                grid[i, j] = 0.0
    fig, ax = plt.subplots(figsize=(1.2 * len(methods) + 2, 0.5 * len(models) + 1.5))
    ax.imshow(grid, cmap="RdYlGn", vmin=0, vmax=1, aspect="auto")
    ax.set_xticks(range(len(methods)), [m or "ddp" for m in methods], rotation=30)
    ax.set_yticks(range(len(models)), models)
    ax.set_title(f"feasible (green) on {num_hosts}x{chips_per_host} {tpu_type}")
    fig.tight_layout()
    fig.savefig(output, dpi=150)
    print(f"wrote {output}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--chips-per-host", type=int, default=1)
    p.add_argument("--tpu-type", default="v5e")
    p.add_argument("--models", nargs="+", default=["pythia-160m", "pythia-410m", "pythia-1b"])
    p.add_argument("--output", default="feasibility.png")
    a = p.parse_args()
    feasibility(a.num_hosts, a.chips_per_host, a.tpu_type, a.models, a.output)
