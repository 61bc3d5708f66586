"""Per-model total training FLOPs chart (parity: plotting/model_flops.py)."""

import argparse
import sys

sys.path.insert(0, ".")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from multimodal_llm_pretraining_tpu.benchmarking.flops import analytic_flops_per_example
from multimodal_llm_pretraining_tpu.models import get_model_class


def model_flops_chart(models: list[str], output: str = "model_flops.png"):
    names, values = [], []
    for mt in models:
        mc = get_model_class(mt)  # type: ignore[arg-type]
        per = analytic_flops_per_example(mc)
        if per is None:
            continue
        names.append(mt)
        values.append(per * mc.batch_size * mc.training_steps)
    fig, ax = plt.subplots(figsize=(8, 0.5 * len(names) + 1.5))
    ax.barh(names, values, color="#d65f5f")
    ax.set_xscale("log")
    ax.set_xlabel("total training FLOPs")
    ax.invert_yaxis()
    fig.tight_layout()
    fig.savefig(output, dpi=150)
    print(f"wrote {output}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+", default=["pythia-160m", "pythia-410m", "pythia-1b", "pythia-2.8b", "roberta", "vit"])
    p.add_argument("--output", default="model_flops.png")
    a = p.parse_args()
    model_flops_chart(a.models, a.output)
