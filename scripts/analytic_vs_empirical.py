"""Cross-check empirical step timings against the analytic FLOPs model
(parity: the reference runs TrainingTimeAnalytic alongside
TrainingTimeEmpirical to validate the harness; BASELINE.md's north star asks
for <=10% agreement once the analytic model assumes a realistic MFU).

For every cached empirical result this prints the implied model-FLOPs
utilization: implied_mfu = analytic_days(100% peak) / empirical_days. The
analytic estimate with ``--assumed-mfu`` set to the best method's implied
MFU then agrees with the empirical number by construction; the useful signal
is how MFU varies across methods.
"""

import argparse
import sys

sys.path.insert(0, ".")

from multimodal_llm_pretraining_tpu.experiments.config import TrainingConfig
from multimodal_llm_pretraining_tpu.experiments.training_time_analytic import TrainingTimeAnalytic
from scripts.plotting import load_results


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--chips-per-host", type=int, default=1)
    p.add_argument("--tpu-type", default="v5e")
    p.add_argument("--model", default="pythia-160m")
    a = p.parse_args()

    df = load_results(a.num_hosts, a.chips_per_host, a.tpu_type, a.model)
    if df.empty:
        raise SystemExit("no cached empirical results; run scripts/benchmark.py first")

    cfg = TrainingConfig(
        num_hosts=a.num_hosts, chips_per_host=a.chips_per_host, tpu_type=a.tpu_type, model=a.model, free_lunch=True
    )
    analytic_days = TrainingTimeAnalytic(config=cfg).results()["training_days"]
    print(f"analytic lower bound (100% of peak): {analytic_days:.2f} days\n")
    df = df.sort_values("training_days")
    df["implied_mfu"] = analytic_days / df["training_days"]
    print(df[["method", "micro_batch_size", "training_days", "implied_mfu"]].to_string(index=False, float_format=lambda v: f"{v:.3f}"))
    best = df.iloc[0]
    print(
        f"\nbest method '{best['method']}': empirical {best['training_days']:.2f} days, "
        f"implied MFU {best['implied_mfu'] * 100:.1f}% of datasheet peak"
    )


if __name__ == "__main__":
    main()
