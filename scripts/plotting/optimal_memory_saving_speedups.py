"""Speedup of the best memory-saving method over free-lunch-only
(parity: plotting/optimal_memory_saving_speedups.py)."""

from . import load_results, standard_cli


def speedups(num_hosts, chips_per_host, tpu_type, model, output=None):
    df = load_results(num_hosts, chips_per_host, tpu_type, model)
    if df.empty:
        print("no cached results; run scripts/benchmark.py first")
        return
    base = df[(df["free_lunch"]) & (~df["activation_checkpointing"]) & (df["sharding"] == "") & (~df["offloading"])]
    best = df.sort_values("training_days").iloc[0]
    if base.empty:
        print("free-lunch baseline not benchmarked yet")
        return
    b = base.iloc[0]
    print(f"free-lunch baseline: {b['training_days']:.2f} days (mbs {int(b['micro_batch_size'])})")
    print(f"best method '{best['method']}': {best['training_days']:.2f} days (mbs {int(best['micro_batch_size'])})")
    print(f"speedup: {b['training_days'] / best['training_days']:.2f}x")


if __name__ == "__main__":
    standard_cli(speedups)
