"""Run a sweep from a JSON search-space file (parity: the reference's
``experiments/*_sweep.py`` CLIs over ``experiments/sweep_configs/``).

    python scripts/run_sweep.py --sweep training_time_empirical \
        --search-space sweep_configs/training_time_empirical/main.json \
        --cmd run [--slurm]
"""

import argparse
import sys

sys.path.insert(0, ".")

from multimodal_llm_pretraining_tpu.experiments.base_classes import Sweep
from multimodal_llm_pretraining_tpu.experiments.sweeps import (
    CountFlopsSweep,
    TrainingTimeAnalyticSweep,
    TrainingTimeEmpiricalSweep,
    load_search_space,
)

SWEEPS = {
    "training_time_empirical": TrainingTimeEmpiricalSweep,
    "training_time_analytic": TrainingTimeAnalyticSweep,
    "count_flops": CountFlopsSweep,
}


def main():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--sweep", choices=sorted(SWEEPS), required=True)
    p.add_argument("--search-space", required=True, help="JSON file of {dimension: [values]}")
    p.add_argument("--cmd", choices=["run", "count", "print-incomplete", "print-results"], default="run")
    p.add_argument("--slurm", action="store_true")
    a = p.parse_args()
    sweep = SWEEPS[a.sweep](search_space=load_search_space(a.search_space))
    Sweep.run(experiment_sweep=sweep, cmd=a.cmd, slurm=a.slurm)


if __name__ == "__main__":
    main()
