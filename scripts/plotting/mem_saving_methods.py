"""Memory-saving-method comparison chart (parity: plotting/mem_saving_methods.py):
training-days bars per method, annotated with the max micro-batch each
method unlocked."""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from . import load_results, standard_cli


def mem_saving_chart(num_hosts, chips_per_host, tpu_type, model, output=None):
    df = load_results(num_hosts, chips_per_host, tpu_type, model)
    if df.empty:
        print("no cached results; run scripts/benchmark.py first")
        return
    df = df.sort_values("training_days")
    fig, ax = plt.subplots(figsize=(9, 0.45 * len(df) + 1.5))
    bars = ax.barh(df["method"], df["training_days"], color="#4878cf")
    for bar, mbs in zip(bars, df["micro_batch_size"]):
        ax.text(bar.get_width(), bar.get_y() + bar.get_height() / 2, f" mbs={int(mbs)}", va="center", fontsize=8)
    ax.set_xlabel("projected training days")
    ax.set_title(f"{model} on {num_hosts}x{chips_per_host} {tpu_type}")
    ax.invert_yaxis()
    fig.tight_layout()
    out = output or f"mem_saving_{model}_{tpu_type}.png"
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    standard_cli(mem_saving_chart)
