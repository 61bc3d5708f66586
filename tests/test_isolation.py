"""Fresh-process probe isolation: a dying worker never takes down the search."""

import numpy as np
import pytest

from multimodal_llm_pretraining_tpu.benchmarking.isolation import classify_worker_failure, run_probe_worker
from multimodal_llm_pretraining_tpu.benchmarking.max_batch_size import find_max_mbs_pow2
from multimodal_llm_pretraining_tpu.benchmarking.utils import BenchmarkHarness
from multimodal_llm_pretraining_tpu.experiments.config import TrainingConfig
from multimodal_llm_pretraining_tpu.experiments.training_time_empirical import benchmark_step_time
from multimodal_llm_pretraining_tpu.models import get_model_class
from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
from multimodal_llm_pretraining_tpu.train import TrainingPlan


def _harness():
    mc = get_model_class("pythia-14m")
    plan = TrainingPlan(
        num_training_steps=1,
        micro_batch_size=1,
        gradient_accumulation_steps=1,
        optimizer=mc.optimizer,
        optimizer_kwargs=mc.optimizer_kwargs,
        scheduler_type=mc.scheduler_type,
        scheduler_kwargs=mc.scheduler_kwargs,
        max_grad_norm=mc.max_grad_norm,
        use_custom_kernels=False,
        mesh=MeshConfig(num_hosts=1, chips_per_host=8),
    )
    h = BenchmarkHarness(plan, mc)
    h.session.dataset.sequence_length = 17
    return h


def test_worker_env_drops_plugin_poisoned_tpu_vars(monkeypatch):
    """A failed axon metadata query writes WARNING text into TPU_* env vars
    (TPU_WORKER_HOSTNAMES, TPU_ACCELERATOR_TYPE, ...); children inheriting
    them die at libtpu init before the backend exists. With no clean
    snapshot available the worker env maps hostnames to localhost and DROPS
    any other poisoned TPU_* var so the child's own metadata query runs
    fresh."""
    from multimodal_llm_pretraining_tpu.benchmarking import isolation

    monkeypatch.setattr(isolation, "_CLEAN_TPU_ENV", {})
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "WARNING: could not determine TPU worker hostnames or IP addresses")
    monkeypatch.setenv("TPU_ACCELERATOR_TYPE", "WARNING: could not determine TPU accelerator type")
    monkeypatch.setenv("TPU_TEST_CLEAN_VAR", "v5litepod-1")
    env = isolation._worker_env()
    assert env["TPU_WORKER_HOSTNAMES"] == "localhost"
    assert "TPU_ACCELERATOR_TYPE" not in env
    assert env["TPU_TEST_CLEAN_VAR"] == "v5litepod-1"


def test_worker_env_repairs_from_clean_snapshot(monkeypatch):
    """The first _worker_env call on a healthy parent snapshots the plugin's
    clean metadata; later poisoned OR missing values are repaired from the
    snapshot (the child never depends on its own metadata query, which fails
    transiently under tunnel contention)."""
    from multimodal_llm_pretraining_tpu.benchmarking import isolation

    monkeypatch.setattr(isolation, "_CLEAN_TPU_ENV", {})
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setenv("TPU_ACCELERATOR_TYPE", "v5litepod-4")
    monkeypatch.setenv("TPU_TOPOLOGY", "1x1")
    env = isolation._worker_env()
    assert env["TPU_ACCELERATOR_TYPE"] == "v5litepod-4"

    # poisoned later in the parent's lifetime -> repaired, not dropped
    monkeypatch.setenv("TPU_ACCELERATOR_TYPE", "WARNING: could not determine TPU accelerator type")
    monkeypatch.delenv("TPU_TOPOLOGY")
    env = isolation._worker_env()
    assert env["TPU_ACCELERATOR_TYPE"] == "v5litepod-4"
    assert env["TPU_TOPOLOGY"] == "1x1"  # missing var backfilled
    assert env["TPU_WORKER_HOSTNAMES"] == "localhost"


def test_search_survives_poisoned_runtime_probe():
    """Simulate the failure the subprocess model exists for: runtime probes
    above mbs=2 'die' (as a crashed worker reports False); the parent search
    must keep going and return the correct answer -- with no in-process
    device state at risk."""
    probed = []

    def confirm(mbs):
        probed.append(mbs)
        return mbs <= 2  # mbs 4, 8 statically fit but die at runtime

    best = find_max_mbs_pow2(_harness(), limit=8, hbm_budget_bytes=1 << 40, confirm=confirm)
    assert best == 2
    assert probed == [8, 4, 2]  # halving walked down through the failures


def test_failure_classification():
    assert classify_worker_failure("... RESOURCE_EXHAUSTED: Ran out of memory ...") == {"oom": True}
    assert classify_worker_failure("Mosaic lowering failed for op ...") == {"lowering_failure": True}
    assert classify_worker_failure("SyntaxError: invalid syntax") is None
    # transient backend faults (tunnel drop mid-sweep) are their own class
    assert classify_worker_failure("jax.errors.JaxRuntimeError: UNAVAILABLE: TPU device error") == {"infra": True}
    assert classify_worker_failure("DEADLINE_EXCEEDED: RPC timed out") == {"infra": True}
    # OOM containing backend noise still classifies as OOM (checked first)
    assert classify_worker_failure("UNAVAILABLE retry... then Ran out of memory") == {"oom": True}


def _fake_completed(returncode, stdout="", stderr=""):
    import subprocess

    return subprocess.CompletedProcess(args=[], returncode=returncode, stdout=stdout, stderr=stderr)


def test_probe_worker_retries_transient_backend_faults(monkeypatch):
    """A tunnel UNAVAILABLE mid-probe retries the worker instead of failing
    the arm; a later healthy attempt wins."""
    from multimodal_llm_pretraining_tpu.benchmarking import isolation

    attempts = []

    def fake_run(cmd, **kw):
        attempts.append(1)
        if len(attempts) < 3:
            return _fake_completed(1, stderr="JaxRuntimeError: UNAVAILABLE: TPU device error")
        return _fake_completed(0, stdout='MLPT_RESULT:{"ok": true, "value": 7}\n')

    monkeypatch.setattr(isolation, "_run_tracked", fake_run)
    monkeypatch.setattr(isolation.time, "sleep", lambda s: None)
    result = isolation.run_probe_worker({"op": "confirm"}, infra_retries=2)
    assert result == {"ok": True, "value": 7}
    assert len(attempts) == 3


def test_probe_worker_raises_infrastructure_error_when_fault_persists(monkeypatch):
    from multimodal_llm_pretraining_tpu.benchmarking import isolation
    from multimodal_llm_pretraining_tpu.utils import InfrastructureError

    monkeypatch.setattr(
        isolation, "_run_tracked",
        lambda cmd, **kw: _fake_completed(1, stderr="UNAVAILABLE: TPU device error"),
    )
    monkeypatch.setattr(isolation.time, "sleep", lambda s: None)
    with pytest.raises(InfrastructureError, match="backend faults"):
        isolation.run_probe_worker({"op": "confirm"}, infra_retries=1)


def test_probe_worker_hang_is_infrastructure_not_arm_failure(monkeypatch):
    """A worker hung past its deadline (tunnel contention stretches remote
    compiles arbitrarily) must surface as InfrastructureError -- never cached
    as an arm result -- and must not retry (another hang would burn the same
    wall clock again)."""
    import subprocess as sp

    from multimodal_llm_pretraining_tpu.benchmarking import isolation
    from multimodal_llm_pretraining_tpu.utils import InfrastructureError

    calls = []

    def fake_run(cmd, **kw):
        calls.append(1)
        raise sp.TimeoutExpired(cmd, kw.get("timeout"), output="", stderr="")

    monkeypatch.setattr(isolation, "_run_tracked", fake_run)
    with pytest.raises(InfrastructureError, match="hung past"):
        isolation.run_probe_worker({"op": "confirm"}, timeout=5.0)
    assert len(calls) == 1


@pytest.mark.slow
def test_probe_worker_end_to_end():
    """The real worker subprocess: builds the plan from JSON, runs one
    confirm step on the (inherited virtual CPU) mesh, reports ok."""
    cfg = TrainingConfig(num_hosts=1, chips_per_host=8, tpu_type="v5e", model="pythia-14m")
    result = run_probe_worker(
        {
            "op": "confirm",
            "config": cfg.__dict__,
            "micro_batch_size": 1,
            "dataset_overrides": {"sequence_length": 17},
        },
        timeout=900,  # 1-core CI host under concurrent suites needs headroom
    )
    assert result.get("ok") is True


@pytest.mark.slow
def test_probe_worker_confirm_fused_end_to_end():
    """confirm_fused runs ONE production fused step (grad-acc 2) in the
    worker -- the ground-truth probe for statically-rejected micro-batches."""
    cfg = TrainingConfig(num_hosts=1, chips_per_host=8, tpu_type="v5e", model="pythia-14m")
    result = run_probe_worker(
        {
            "op": "confirm_fused",
            "config": cfg.__dict__,
            "micro_batch_size": 1,
            "dataset_overrides": {"sequence_length": 17},
        },
        timeout=900,  # 1-core CI host under concurrent suites needs headroom
    )
    assert result.get("ok") is True


@pytest.mark.slow
def test_probe_worker_time_fused_end_to_end():
    """The real worker subprocess times the production fused step."""
    cfg = TrainingConfig(num_hosts=1, chips_per_host=8, tpu_type="v5e", model="pythia-14m")
    result = run_probe_worker(
        {
            "op": "time_fused",
            "config": cfg.__dict__,
            "micro_batch_size": 1,
            "accumulation_steps": 2,
            "samples": 1,
            "dataset_overrides": {"sequence_length": 17},
        },
        timeout=900,  # 1-core CI host under concurrent suites needs headroom
    )
    assert result.get("ok") is True
    assert result["step_time_fused"] > 0


_timing_fn = benchmark_step_time.__wrapped_step__


def _cfg(**kw):
    base = dict(num_hosts=1, chips_per_host=8, tpu_type="v5e", model="pythia-14m")
    base.update(kw)
    return TrainingConfig(**base)


def test_step_time_halves_when_worker_ooms():
    calls = []

    def fake_worker(spec):
        if spec["op"] == "time_fused":
            assert spec["accumulation_steps"] == 4
            return {"ok": True, "step_time_fused": 1.7}
        calls.append(spec["micro_batch_size"])
        if spec["micro_batch_size"] > 2:
            return {"oom": True}
        return {"ok": True, "accumulate_s": 0.5, "optimizer_s": 0.1, "micro_batch_size": spec["micro_batch_size"]}

    res = _timing_fn(_cfg(), max_micro_batch_size=8, target_micro_batch_size=8,
                     num_benchmarking_steps=3, _run_worker=fake_worker)
    assert res["micro_batch_size"] == 2
    assert calls == [8, 4, 2]
    # split extrapolation: acc * (8 // 2) + optim; fused is authoritative
    assert np.isclose(res["step_time_split"], 0.5 * 4 + 0.1)
    assert np.isclose(res["step_time_fused"], 1.7)
    assert np.isclose(res["step_time"], 1.7)
    assert res["compile_disabled"] is False


def test_max_mbs_upgrade_past_static_rejection():
    """The static table analyzes the standalone accumulate program, which
    overestimates the production fused step's footprint; candidates it
    rejects are ground-truthed by really running the fused step."""
    upgrades = []

    def upgrade(mbs):
        upgrades.append(mbs)
        return mbs <= 4  # the production step really runs mbs 4, not 8

    # static table: only mbs 1, 2 fit within a tiny budget
    h = _harness()
    best = find_max_mbs_pow2(h, limit=8, hbm_budget_bytes=1, confirm=lambda m: True, upgrade=upgrade)
    # budget of 1 byte: static table rejects mbs 1 -> best 0, no upgrades
    assert best == 0 and upgrades == []


class _RatioHarness:
    """Static-check stub: fit_check answers from a fixed mbs->ratio map."""

    def __init__(self, ratios):
        self.ratios = ratios
        self.lazy_checks = []

    def fit_check(self, mbs, hbm_budget_bytes=None, safety=0.94):
        self.lazy_checks.append(mbs)
        r = self.ratios[mbs]
        return (r is not None and r <= 1.0), r

    def release_probe(self, micro_batch_size=None):
        pass


def test_max_mbs_upgrade_skips_statically_hopeless_candidates():
    """A statically rejected candidate is only worth an OOM probe while its
    predicted/budget ratio stays inside the buffer-reuse band; past it the
    probe is skipped on static evidence (round-4: convnext arms each wasted
    ~4.5 min on upgrade probes at 1.49x budget that could never fit)."""
    probed = []
    h = _RatioHarness({1: 0.5, 2: 0.9, 4: 1.2, 8: 2.0})
    best = find_max_mbs_pow2(
        h, limit=16, confirm=lambda m: True,
        upgrade=lambda m: probed.append(m) is None,
    )
    # 4 (1.2x, within the 1.30x band) is probed and upgrades; 8 (2.0x) is
    # skipped without a worker -- its ratio came from a lazy static check
    assert best == 4
    assert probed == [4]
    assert 8 in h.lazy_checks


def test_max_mbs_upgrade_doubles_while_production_step_survives():
    """Candidates refuted by the split-program probes (statically or at
    runtime) are re-tried with the production fused step, doubling while it
    survives."""
    probed = []

    def upgrade(mbs):
        probed.append(mbs)
        return mbs <= 4  # the production step really runs mbs 4, not 8

    # runtime confirm refutes everything above 1 for the standalone programs
    best = find_max_mbs_pow2(_harness(), limit=8, hbm_budget_bytes=1 << 40,
                             confirm=lambda m: m <= 1, upgrade=upgrade)
    assert best == 4
    assert probed == [2, 4, 8]  # doubled from the confirmed floor, stopped at 8


def test_step_time_fused_primary_runs_fused_at_ground_truthed_mbs():
    """fused_primary: the split phases halve to what the standalone programs
    fit, but the fused probe runs at the arm's (production-verified) mbs and
    its number is the arm's measurement."""
    fused_specs = []

    def fake_worker(spec):
        if spec["op"] == "time_fused":
            fused_specs.append((spec["micro_batch_size"], spec["accumulation_steps"]))
            return {"ok": True, "step_time_fused": 1.7}
        if spec["micro_batch_size"] > 2:
            return {"oom": True}  # standalone phases OOM above mbs 2
        return {"ok": True, "accumulate_s": 0.5, "optimizer_s": 0.1, "micro_batch_size": spec["micro_batch_size"]}

    res = _timing_fn(_cfg(), max_micro_batch_size=4, target_micro_batch_size=16,
                     num_benchmarking_steps=1, fused_primary=True, _run_worker=fake_worker)
    assert fused_specs == [(4, 4)]  # fused at the production mbs 4, acc 16/4
    assert res["micro_batch_size"] == 4
    assert res["micro_batch_size_split"] == 2
    assert np.isclose(res["step_time"], 1.7)
    assert np.isclose(res["step_time_split"], 0.5 * 8 + 0.1)  # split at its own mbs


def test_step_time_fused_only_when_split_infeasible():
    """Every split-phase probe OOMs but the production step runs: the arm
    reports a fused-only measurement instead of failing."""
    def fake_worker(spec):
        if spec["op"] == "time_fused":
            assert spec["micro_batch_size"] == 4 and spec["accumulation_steps"] == 4
            return {"ok": True, "step_time_fused": 2.0}
        return {"oom": True}

    res = _timing_fn(_cfg(), max_micro_batch_size=4, target_micro_batch_size=16,
                     num_benchmarking_steps=1, fused_primary=True, _run_worker=fake_worker)
    assert res["micro_batch_size"] == 4
    assert res["micro_batch_size_split"] == 0
    assert res["step_time_split"] is None
    assert np.isclose(res["step_time"], 2.0)


def test_step_time_fused_probe_caps_accumulation():
    """A fused program spanning the full target accumulation (256 x ~0.5 s
    at 1b) exceeds the backend's per-execution deadline and ABORTs; the probe
    runs at <=32 in-program microbatches and the target-acc time follows
    linearly (scan of identical iterations) with the optimizer phase as the
    intercept."""
    fused_specs = []

    def fake_worker(spec):
        if spec["op"] == "time_fused":
            fused_specs.append(spec["accumulation_steps"])
            return {"ok": True, "step_time_fused": 15.5}
        return {"ok": True, "accumulate_s": 0.52, "optimizer_s": 0.12, "micro_batch_size": spec["micro_batch_size"]}

    res = _timing_fn(_cfg(), max_micro_batch_size=4, target_micro_batch_size=1024,
                     num_benchmarking_steps=3, _run_worker=fake_worker)
    assert fused_specs == [32]
    # (15.5 - 0.12) * (256 / 32) + 0.12
    assert np.isclose(res["step_time_fused"], (15.5 - 0.12) * 8 + 0.12)
    assert np.isclose(res["step_time"], res["step_time_fused"])
    assert np.isclose(res["step_time_split"], 0.52 * 256 + 0.12)


def test_step_time_fused_probe_caps_rows_not_acc():
    """The deadline bounds program DURATION ~ in-program sample rows
    (mbs x acc): at mbs 16 the probe drops to acc 8, not acc 32."""
    fused_specs = []

    def fake_worker(spec):
        if spec["op"] == "time_fused":
            fused_specs.append((spec["micro_batch_size"], spec["accumulation_steps"]))
            return {"ok": True, "step_time_fused": 8.0}
        return {"ok": True, "accumulate_s": 1.0, "optimizer_s": 0.1, "micro_batch_size": spec["micro_batch_size"]}

    res = _timing_fn(_cfg(), max_micro_batch_size=16, target_micro_batch_size=1024,
                     num_benchmarking_steps=1, fused_primary=True, _run_worker=fake_worker)
    assert fused_specs == [(16, 8)]  # 128-row cap
    # (8.0 - 0.1) * (64 / 8) + 0.1
    assert np.isclose(res["step_time"], 7.9 * 8 + 0.1)


def test_step_time_keeps_split_when_fused_probe_hits_backend_faults():
    """A persistent backend fault in the fused probe must not fail the arm:
    the split measurement already succeeded and remains the protocol."""
    from multimodal_llm_pretraining_tpu.utils import InfrastructureError

    def fake_worker(spec):
        if spec["op"] == "time_fused":
            raise InfrastructureError("probe worker (time_fused) failed 3x on backend faults")
        return {"ok": True, "accumulate_s": 0.5, "optimizer_s": 0.1, "micro_batch_size": spec["micro_batch_size"]}

    res = _timing_fn(_cfg(), max_micro_batch_size=2, target_micro_batch_size=8,
                     num_benchmarking_steps=1, _run_worker=fake_worker)
    assert res["step_time_fused"] is None
    assert np.isclose(res["step_time"], 0.5 * 4 + 0.1)


def test_step_time_skips_fused_for_offload_arms():
    """Offload arms keep the split protocol: their production step IS the
    multi-program streamed update the split probes measure, and fused timing
    would recompile ~13 grouped host-update programs per arm for nothing."""
    ops = []

    def fake_worker(spec):
        ops.append(spec["op"])
        return {"ok": True, "accumulate_s": 0.5, "optimizer_s": 1.5, "micro_batch_size": spec["micro_batch_size"]}

    res = _timing_fn(_cfg(sharding="zero_2", offloading=True), max_micro_batch_size=2,
                     target_micro_batch_size=8, num_benchmarking_steps=1, _run_worker=fake_worker)
    assert ops == ["time_phases"]  # no time_fused op dispatched
    assert res["step_time_fused"] is None
    assert np.isclose(res["step_time"], 0.5 * 4 + 1.5)


def test_step_time_keeps_split_when_fused_unmeasurable():
    def fake_worker(spec):
        if spec["op"] == "time_fused":
            return {"oom": True}  # fused program needs slightly more HBM
        return {"ok": True, "accumulate_s": 0.5, "optimizer_s": 0.1, "micro_batch_size": spec["micro_batch_size"]}

    res = _timing_fn(_cfg(), max_micro_batch_size=2, target_micro_batch_size=8,
                     num_benchmarking_steps=1, _run_worker=fake_worker)
    assert res["step_time_fused"] is None
    assert np.isclose(res["step_time"], 0.5 * 4 + 0.1)


def test_step_time_fused_probe_ooms_halve_the_fused_mbs():
    """The static fit table models the STANDALONE accumulate program; the
    production fused step stacks an [acc, ...] batch plus conv workspace the
    split program never holds, and for conv/NHWC workloads its peak EXCEEDS
    the split-approved micro-batch (round-4: convnext confirm_fused workers
    died {'oom': True} at the table-approved mbs and the grid silently kept
    split timings diverging up to 2.1x). An OOMed fused probe must halve the
    FUSED micro-batch and re-probe -- the arm's reported mbs is what the
    production step actually runs."""
    fused_attempts = []

    def fake_worker(spec):
        if spec["op"] == "time_fused":
            fused_attempts.append(spec["micro_batch_size"])
            if spec["micro_batch_size"] > 2:
                return {"oom": True}
            return {"ok": True, "step_time_fused": 1.2}
        return {"ok": True, "accumulate_s": 0.5, "optimizer_s": 0.1, "micro_batch_size": spec["micro_batch_size"]}

    res = _timing_fn(_cfg(), max_micro_batch_size=8, target_micro_batch_size=8,
                     num_benchmarking_steps=1, _run_worker=fake_worker)
    assert fused_attempts == [8, 4, 2]
    # the arm reports the fused program's real micro-batch, not the split one
    assert res["micro_batch_size"] == 2
    assert res["micro_batch_size_split"] == 8
    assert res["step_time_fused"] is not None
    # fused acc at mbs 2 = 4, probe acc = 4: no extrapolation, 1.2 s verbatim
    assert np.isclose(res["step_time"], 1.2)


def test_step_time_falls_back_on_lowering_failure():
    """A Pallas/Mosaic lowering failure under free-lunch retries exactly once
    on plain XLA kernels (the reference's compile-timeout fallback analog)."""
    seen_overrides = []

    def fake_worker(spec):
        if spec["op"] == "time_fused":
            return {"ok": True, "step_time_fused": 1.1}
        seen_overrides.append(dict(spec["plan_overrides"]))
        if not spec["plan_overrides"]:
            return {"lowering_failure": True}
        return {"ok": True, "accumulate_s": 1.0, "optimizer_s": 0.2, "micro_batch_size": spec["micro_batch_size"]}

    res = _timing_fn(_cfg(free_lunch=True), max_micro_batch_size=4, target_micro_batch_size=4,
                     num_benchmarking_steps=1, _run_worker=fake_worker)
    assert res["compile_disabled"] is True
    assert seen_overrides == [{}, {"use_custom_kernels": False, "compile": False}]


def test_step_time_lowering_failure_without_fallback_raises():
    def fake_worker(spec):
        return {"lowering_failure": True}

    with pytest.raises(RuntimeError, match="no fallback"):
        _timing_fn(_cfg(free_lunch=False), max_micro_batch_size=2, target_micro_batch_size=2,
                   num_benchmarking_steps=1, _run_worker=fake_worker)


def test_step_time_gives_up_below_mbs_one():
    res = _timing_fn(_cfg(), max_micro_batch_size=2, target_micro_batch_size=2,
                     num_benchmarking_steps=1, _run_worker=lambda spec: {"oom": True})
    assert res is None
