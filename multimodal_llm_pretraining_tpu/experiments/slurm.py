"""SLURM submission for TPU-pod experiments.

Analog of ``experiments/utils/slurm.py:9-47`` (submitit + slurm.toml) and the
submitit executor semantics in ``experiments/utils/base_classes.py:102-121,
199-231``. TPU clusters schedule whole hosts, not GPUs, so the job spec names
hosts and TPU type; per-type partition/account/constraint merge from
``tpu_cluster.toml`` in the repo root (the ``slurm.toml`` analog).

Submission shells out to ``sbatch`` directly (no submitit dependency):

- ``submit(experiment)`` emits the *experiment's own* CLI invocation
  (``executor.submit(self.run)`` analog -- submitit pickles the bound run;
  here the experiment re-materializes from its dataclass fields via the
  module's ``cli()`` entry point).
- ``submit_batch(experiments)`` produces ONE job-array submission whose task
  i runs experiment i (the submitit batch-context analog) -- not N copies.
- If ``MLPT_SLURM_SNAPSHOT_ROOT`` is set, the code tree is snapshotted at
  submit time and the job runs from the snapshot, so queued jobs never see
  mid-sweep code drift (``submitit.helpers.RsyncSnapshot`` analog,
  reference ``base_classes.py:112-116``).
"""

import dataclasses
import json
import os
import shlex
import shutil
import subprocess
import sys
import tomllib
import uuid
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


def experiment_command(experiment) -> str:
    """The experiment's own CLI invocation: ``python -m <module> --field v``.

    Round-trips through ``Experiment.cli`` (base_classes.py): nested
    dataclass fields serialize as JSON object strings, bools as flags.
    """
    cls = type(experiment)
    parts = [sys.executable, "-m", cls.__module__]
    for f in dataclasses.fields(experiment):
        v = getattr(experiment, f.name)
        if v is None:
            continue
        flag = "--" + f.name.replace("_", "-")
        if isinstance(v, bool):
            if v:
                parts.append(flag)
        elif dataclasses.is_dataclass(v) and not isinstance(v, type):
            parts += [flag, json.dumps(dataclasses.asdict(v))]
        else:
            parts += [flag, str(v)]
    return " ".join(shlex.quote(p) for p in parts)


def snapshot_code() -> str | None:
    """Copy the working tree into ``$MLPT_SLURM_SNAPSHOT_ROOT/<uuid>`` so the
    queued job runs the code as of submit time (RsyncSnapshot analog).
    Returns the snapshot path, or None when no snapshot root is configured."""
    root = os.environ.get("MLPT_SLURM_SNAPSHOT_ROOT")
    if not root:
        return None
    dst = os.path.join(root, uuid.uuid4().hex)
    shutil.copytree(
        os.getcwd(),
        dst,
        symlinks=True,
        ignore=shutil.ignore_patterns(".git", ".cache", "__pycache__", "*.pyc", ".pytest_cache", "wandb"),
    )
    logger.info(f"code snapshot for SLURM job: {dst}")
    return dst


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

    def _script(self, commands: list[str], workdir: str | None = None) -> str:
        p = self.to_parameters()
        lines = ["#!/bin/bash"]
        for k, v in p.items():
            lines.append(f"#SBATCH --{k.replace('_', '-')}={v}")
        if len(commands) > 1:
            lines.append(f"#SBATCH --array=0-{len(commands) - 1}")
        if workdir is not None:
            lines.append(f"cd {shlex.quote(workdir)}")
        lines += [
            "export MLPT_COORDINATOR_ADDRESS=$(scontrol show hostnames $SLURM_JOB_NODELIST | head -n1):8476",
            "export MLPT_NUM_PROCESSES=$SLURM_JOB_NUM_NODES",
            "export MLPT_PROCESS_INDEX=$SLURM_NODEID",
        ]
        if len(commands) == 1:
            lines.append(f"srun {commands[0]}")
        else:
            # job array: task i runs experiment i's own command
            lines += [
                'CMD=$(sed -n "$((SLURM_ARRAY_TASK_ID + 1))p" <<\'MLPT_CMDS\'',
                *commands,
                "MLPT_CMDS",
                ")",
                'srun bash -c "$CMD"',
            ]
        return "\n".join(lines) + "\n"

    def submit(self, experiment) -> None:
        """Submit ONE experiment: the generated sbatch body re-runs this
        experiment's own CLI (never the surrounding sweep)."""
        self.submit_batch([experiment])

    def submit_batch(self, experiments: list) -> None:
        """One array submission for same-spec experiments (submitit batch
        semantics, reference base_classes.py:199-231)."""
        if not experiments:
            return
        commands = [experiment_command(e) for e in experiments]
        self._sbatch(self._script(commands, workdir=snapshot_code()))

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
