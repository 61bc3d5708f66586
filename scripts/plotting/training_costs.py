"""Hardware cost analysis (parity: plotting/training_costs.py:55-63, which
amortizes GPU purchase prices over 5 years). TPUs are rented, so the cost
model is on-demand $/chip-hour (public Google Cloud us-central list prices;
override with --price) times projected training time."""

import argparse
import sys

sys.path.insert(0, ".")

from . import load_results

# public on-demand list prices, $/chip/hour (approximate; region-dependent)
TPU_PRICE_PER_CHIP_HOUR = {
    "v2": 1.31,
    "v3": 2.20,
    "v4": 3.22,
    "v5e": 1.20,
    "v5p": 4.20,
    "v6e": 2.70,
}


def training_cost_table(num_hosts, chips_per_host, tpu_type, model, price=None):
    df = load_results(num_hosts, chips_per_host, tpu_type, model)
    if df.empty:
        print("no cached results; run scripts/benchmark.py first")
        return None
    rate = price if price is not None else TPU_PRICE_PER_CHIP_HOUR[tpu_type]
    chips = num_hosts * chips_per_host
    df = df.sort_values("training_days")
    df["cost_usd"] = df["training_days"] * 24 * chips * rate
    print(df[["method", "training_days", "cost_usd"]].to_string(index=False, float_format=lambda v: f"{v:,.2f}"))
    return df


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--chips-per-host", type=int, default=1)
    p.add_argument("--tpu-type", default="v5e")
    p.add_argument("--model", default="pythia-160m")
    p.add_argument("--price", type=float, default=None, help="$/chip/hour override")
    a = p.parse_args()
    training_cost_table(a.num_hosts, a.chips_per_host, a.tpu_type, a.model, a.price)
