"""SLURM submission for TPU-pod experiments.

Analog of ``experiments/utils/slurm.py:9-47`` (submitit + slurm.toml). TPU
clusters schedule whole hosts, not GPUs, so the job spec names hosts and TPU
type; per-type partition/account/constraint merge from ``tpu_cluster.toml``
in the repo root (the ``slurm.toml`` analog). Submission shells out to
``sbatch`` directly (no submitit dependency); the generated script re-runs
the current experiment CLI on every host with MLPT_* coordination env vars
(see ``distribute.py``).
"""

import os
import shlex
import subprocess
import sys
import tomllib
from dataclasses import dataclass, field

from ..tpus import TpuT
from ..utils import get_logger

logger = get_logger()


def _cluster_params(tpu_type: str) -> dict:
    path = os.environ.get("MLPT_CLUSTER_TOML", "tpu_cluster.toml")
    if not os.path.exists(path):
        return {}
    with open(path, "rb") as f:
        cfg = tomllib.load(f)
    return cfg.get(tpu_type, cfg.get("default", {}))


@dataclass(frozen=True)
class SlurmJob:
    time_min: int
    num_hosts: int
    mem_per_host_gb: int
    cpus_per_host: int
    tpu_type: TpuT
    extra_params: tuple = field(default_factory=tuple)

    def to_parameters(self) -> dict:
        params = {
            "time": self.time_min,
            "nodes": self.num_hosts,
            "mem": f"{self.mem_per_host_gb}G",
            "cpus_per_task": self.cpus_per_host,
            **_cluster_params(self.tpu_type),
            **dict(self.extra_params),
        }
        return params

    def _script(self, command: str) -> str:
        p = self.to_parameters()
        lines = ["#!/bin/bash"]
        for k, v in p.items():
            lines.append(f"#SBATCH --{k.replace('_', '-')}={v}")
        lines += [
            "export MLPT_COORDINATOR_ADDRESS=$(scontrol show hostnames $SLURM_JOB_NODELIST | head -n1):8476",
            "export MLPT_NUM_PROCESSES=$SLURM_JOB_NUM_NODES",
            "export MLPT_PROCESS_INDEX=$SLURM_NODEID",
            f"srun {command}",
        ]
        return "\n".join(lines) + "\n"

    def submit(self, experiment) -> None:
        argv = " ".join(shlex.quote(a) for a in [sys.executable, *sys.argv])
        self._sbatch(self._script(argv))

    def submit_batch(self, experiments: list) -> None:
        # identical jobs run sequentially inside one allocation, like the
        # reference's submitit batch context (base_classes.py:199-219)
        for exp in experiments:
            self.submit(exp)

    def _sbatch(self, script: str) -> None:
        outdir = os.environ.get("MLPT_SLURM_OUTPUT_DIR", ".cache/slurm_outputs")
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, f"job_{abs(hash(script)) % 10**8}.sbatch")
        with open(path, "w") as f:
            f.write(script)
        try:
            out = subprocess.run(["sbatch", path], capture_output=True, text=True, check=True)
            logger.info(f"submitted: {out.stdout.strip()}")
        except FileNotFoundError:
            logger.info(f"sbatch not available; wrote script to {path} -- run it manually on the cluster")
