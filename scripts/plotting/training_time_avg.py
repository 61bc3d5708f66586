"""Average training-time improvement across models (parity:
plotting/training_time_avg.py): for each model, naive vs free-lunch vs best
overall, averaged into a summary row."""

import argparse
import sys

sys.path.insert(0, ".")

import pandas as pd

from . import load_results


def training_time_avg(num_hosts, chips_per_host, tpu_type, models):
    rows = []
    for model in models:
        df = load_results(num_hosts, chips_per_host, tpu_type, model)
        if df.empty:
            continue
        naive = df[df["method"] == "naive"]["training_days"].min()
        fl = df[df["method"] == "free-lunch"]["training_days"].min()
        best = df["training_days"].min()
        rows.append(dict(model=model, naive_days=naive, free_lunch_days=fl, best_days=best))
    if not rows:
        print("no cached results; run scripts/benchmark.py first")
        return
    out = pd.DataFrame(rows)
    out.loc["mean"] = out.mean(numeric_only=True)
    print(out.to_string(float_format=lambda v: f"{v:.2f}"))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--chips-per-host", type=int, default=1)
    p.add_argument("--tpu-type", default="v5e")
    p.add_argument("--models", nargs="+", default=["pythia-160m", "pythia-410m", "pythia-1b"])
    a = p.parse_args()
    training_time_avg(a.num_hosts, a.chips_per_host, a.tpu_type, a.models)
