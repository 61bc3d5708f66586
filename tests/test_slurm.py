"""SLURM dispatch + shared-workspace locking + failed-arm recording.

Covers the reference's submitit semantics (``experiments/utils/
base_classes.py:102-121,199-231``): per-experiment submission, one
array submission per batch, snapshot-at-submit, and no double-execution
of cached/running steps from concurrent submissions.
"""

import glob
import os
from dataclasses import dataclass

import pandas as pd
import pytest

from multimodal_llm_pretraining_tpu.experiments.base_classes import Experiment, Sweep
from multimodal_llm_pretraining_tpu.experiments.cache import (
    MemoryWorkspace,
    StepAlreadyRunning,
    StepFailure,
    Workspace,
    set_workspace,
    step,
)
from multimodal_llm_pretraining_tpu.experiments.config import TrainingConfig
from multimodal_llm_pretraining_tpu.experiments.slurm import SlurmJob, experiment_command
from multimodal_llm_pretraining_tpu.experiments.training_time_empirical import TrainingTimeEmpirical


@pytest.fixture(autouse=True)
def fresh_workspace():
    ws = MemoryWorkspace()
    set_workspace(ws)
    yield ws
    set_workspace(MemoryWorkspace())


@pytest.fixture
def sbatch_dir(tmp_path, monkeypatch):
    """Capture generated sbatch scripts instead of submitting."""
    out = tmp_path / "slurm_out"
    monkeypatch.setenv("MLPT_SLURM_OUTPUT_DIR", str(out))
    monkeypatch.delenv("MLPT_SLURM_SNAPSHOT_ROOT", raising=False)
    import multimodal_llm_pretraining_tpu.experiments.slurm as slurm_mod

    def no_sbatch(*a, **k):
        raise FileNotFoundError("sbatch")

    monkeypatch.setattr(slurm_mod.subprocess, "run", no_sbatch)
    return out


def _experiment(**kw):
    base = dict(num_hosts=2, chips_per_host=4, tpu_type="v4", model="pythia-160m", sharding="fsdp_hybrid_shard")
    base.update(kw)
    return TrainingTimeEmpirical(config=TrainingConfig(**base), benchmarking_steps=5, trial=1)


def _scripts(sbatch_dir):
    return [open(p).read() for p in sorted(glob.glob(str(sbatch_dir / "*.sbatch")))]


def test_experiment_command_is_the_experiments_own_cli():
    cmd = experiment_command(_experiment())
    assert "multimodal_llm_pretraining_tpu.experiments.training_time_empirical" in cmd
    assert "--config" in cmd and '"model": "pythia-160m"' in cmd
    assert "--benchmarking-steps 5" in cmd and "--trial 1" in cmd
    # never the surrounding sweep command
    assert "run_sweep" not in cmd and "--slurm" not in cmd


def test_submit_emits_per_experiment_command(sbatch_dir, monkeypatch):
    monkeypatch.setattr("sys.argv", ["scripts/run_sweep.py", "--everything"])
    exp = _experiment()
    exp.slurm_job.submit(exp)
    (body,) = _scripts(sbatch_dir)
    assert experiment_command(exp) in body
    assert "run_sweep" not in body  # the round-2 bug: resubmitting sys.argv
    assert "#SBATCH --array" not in body  # single job, no array


def test_submit_batch_is_one_array_submission(sbatch_dir):
    exps = [_experiment(), _experiment(model="pythia-410m")]
    exps[0].slurm_job.submit_batch(exps)
    (body,) = _scripts(sbatch_dir)  # exactly ONE submission
    assert "#SBATCH --array=0-1" in body
    for e in exps:
        assert experiment_command(e) in body
    assert 'srun bash -c "$CMD"' in body


def test_snapshot_at_submit(sbatch_dir, tmp_path, monkeypatch):
    snap_root = tmp_path / "snapshots"
    snap_root.mkdir()
    monkeypatch.setenv("MLPT_SLURM_SNAPSHOT_ROOT", str(snap_root))
    workdir = tmp_path / "tree"
    workdir.mkdir()
    (workdir / "marker.py").write_text("x = 1\n")
    monkeypatch.chdir(workdir)
    exp = _experiment()
    exp.slurm_job.submit(exp)
    (snap,) = snap_root.iterdir()
    assert (snap / "marker.py").read_text() == "x = 1\n"
    (body,) = _scripts(sbatch_dir)
    assert f"cd {snap}" in body  # job runs from the frozen snapshot


# --------------------------------------------------------------- locking


def test_workspace_claim_respects_live_foreign_holder(tmp_path):
    ws = Workspace(str(tmp_path))
    uid = "step-001-abc"
    # simulate a live foreign process (pid 1 is alive, not ours)
    with open(os.path.join(str(tmp_path), uid + ".dill.running"), "w") as f:
        f.write("1")
    assert ws.is_running(uid)
    assert not ws.try_claim(uid)
    # stale holder (dead pid) is stolen
    with open(os.path.join(str(tmp_path), uid + ".dill.running"), "w") as f:
        f.write("999999999")
    assert not ws.is_running(uid)
    assert ws.try_claim(uid)
    ws.mark_running(uid, False)


def test_concurrent_submission_does_not_rerun_running_step(tmp_path):
    ws = Workspace(str(tmp_path))
    set_workspace(ws)
    ran = []

    @step(cacheable=True, version="001")
    def slow(x):
        ran.append(x)
        return x

    call = slow(x=3)
    with open(ws._path(call.unique_id()) + ".running", "w") as f:
        f.write("1")  # another live submission is mid-step
    with pytest.raises(StepAlreadyRunning):
        call.result(ws)
    assert ran == []  # the second submission never re-ran the step


# ------------------------------------------------------- failed-arm record

BOOM_RUNS = []


@step(cacheable=True, version="001")
def boom(x):
    BOOM_RUNS.append(x)
    raise ValueError("synthetic arm failure")


@step(cacheable=True, version="001")
def downstream(y):
    return y * 2


@dataclass
class FailingExperiment(Experiment):
    x: int = 0

    @property
    def step_dict(self):
        first = boom(x=self.x)
        return {"a": first, "b": downstream(y=first)}


class FailingSweep(Sweep):
    def build_experiment(self, **a) -> Experiment:
        return FailingExperiment(**a)


def test_failed_arm_cached_with_failure_class(fresh_workspace):
    BOOM_RUNS.clear()
    sweep = FailingSweep(search_space={"x": [7]})
    sweep.sweep()
    exp = sweep.experiments()[0]
    # the arm reads fully cached: "failed", not "not yet run"
    assert exp.is_cached()
    res = exp.results()
    assert isinstance(res["a"], StepFailure) and res["a"].error_type == "ValueError"
    assert isinstance(res["b"], StepFailure) and res["b"].error_type == "UpstreamStepFailure"
    df = sweep.results()
    assert df.loc[0, "failure"].startswith("UpstreamStepFailure") or df.loc[0, "failure"].startswith("ValueError")
    assert pd.isna(df.loc[0, "a"])
    # a second sweep does NOT re-run the failed arm
    sweep.sweep()
    assert BOOM_RUNS == [7]


def test_sweep_skips_running_experiments(fresh_workspace):
    BOOM_RUNS.clear()
    sweep = FailingSweep(search_space={"x": [8]})
    exp = sweep.experiments()[0]
    for call in exp.step_dict.values():
        fresh_workspace.mark_running(call.unique_id(), True)
    sweep.sweep()
    assert BOOM_RUNS == []  # running elsewhere: skipped, not re-run
