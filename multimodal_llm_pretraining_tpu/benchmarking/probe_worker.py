"""Disposable probe worker (see ``benchmarking.isolation``).

Reads one JSON spec from stdin, performs one device-executing operation,
prints ``MLPT_RESULT:{json}``. Crashing (OOM, poisoned runtime, lowering
failure) is an acceptable outcome -- the parent classifies it from output.

Spec fields:
  op: "confirm"      -- setup + one accumulate step + one optimizer step at
                        micro_batch_size (the max-batch runtime confirmation)
      "confirm_fused"-- run ONE production fused train step (grad-acc 2) at
                        micro_batch_size. Ground truth for arms whose
                        production step is a single jit program: the fused
                        step reuses buffers the standalone accumulate
                        program cannot, so it fits micro-batches the static
                        analysis rejects.
      "time_phases"  -- measure (accumulate, optimizer) phase times
      "time_fused"   -- time the production fused train step at
                        ``accumulation_steps`` (needs accumulation_steps)
  config:            TrainingConfig fields (experiments.config)
  micro_batch_size:  probe size
  samples:           timing samples for time_phases (default 3)
  plan_overrides:    TrainingPlan field overrides (e.g. disable kernels)
  dataset_overrides: dataset attribute overrides (tests shrink seq length)
"""

import json
import os
import sys


def _configure_backend() -> None:
    platform = os.environ.get("MLPT_WORKER_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def run(spec: dict) -> dict:
    _configure_backend()

    from ..experiments.config import TrainingConfig
    from ..experiments.distribute import maybe_init_distributed
    from .step_time import measure_phase_times
    from .utils import BenchmarkHarness

    maybe_init_distributed()
    config = TrainingConfig(**spec["config"])
    mbs = int(spec["micro_batch_size"])

    if spec["op"] in ("time_fused", "confirm_fused"):
        from .step_time import measure_fused_step_time
        from ..training.step import TrainSession

        acc = int(spec.get("accumulation_steps", 2))
        plan = config.training_plan(
            num_training_steps=1,
            micro_batch_size=mbs,
            gradient_accumulation_steps=acc,
            **spec.get("plan_overrides", {}),
        )
        plan.configure_compilation_cache()
        session = TrainSession(plan, config.model_class())
        for attr, value in spec.get("dataset_overrides", {}).items():
            setattr(session.dataset, attr, value)
        if spec["op"] == "confirm_fused":
            import jax

            from ..utils import block_on

            state = session.init_state()
            step = session.train_step_fn()
            state, metrics = step(state, session.make_train_batch(seed=0), jax.random.key(0))
            block_on((state.params, metrics))
            return {"ok": True, "micro_batch_size": mbs}
        fused = measure_fused_step_time(session, acc, samples=int(spec.get("samples", 1)))
        return {"ok": True, "micro_batch_size": mbs, "step_time_fused": fused}

    plan = config.training_plan(
        num_training_steps=1,
        micro_batch_size=1,
        gradient_accumulation_steps=1,
        **spec.get("plan_overrides", {}),
    )
    plan.configure_compilation_cache()
    harness = BenchmarkHarness(plan, config.model_class())
    for attr, value in spec.get("dataset_overrides", {}).items():
        setattr(harness.session.dataset, attr, value)
    harness.setup()
    if spec["op"] == "confirm":
        harness.manual_training_step(mbs, seed=0)
        harness.manual_optimization_step()
        return {"ok": True, "micro_batch_size": mbs}
    if spec["op"] == "time_phases":
        times = measure_phase_times(harness, mbs, samples=int(spec.get("samples", 3)))
        return {
            "ok": True,
            "micro_batch_size": mbs,
            "accumulate_s": times.accumulate_s,
            "optimizer_s": times.optimizer_s,
            "samples": times.samples,
        }
    raise ValueError(f"unknown op {spec['op']!r}")


def _repair_tpu_env() -> None:
    """Self-repair poisoned/missing TPU metadata BEFORE backend init.

    Belt to the parent-side ``_worker_env`` suspenders: whatever env this
    process inherited, a complete clean (hostnames, accelerator type,
    topology) triple stops libtpu from re-querying metadata -- the query
    fails transiently under tunnel contention and overwrites ALL of these
    vars with WARNING text, killing the worker at init.

    MUST run before any jax import/backend init and must never itself
    initialize a backend: pins come from env only (the parent exports
    PALLAS_AXON_TPU_GEN in ``_worker_env``). CPU-mode workers (slow test
    matrix) skip entirely -- they never touch libtpu."""
    platform = os.environ.get("MLPT_WORKER_PLATFORM")
    if platform and platform != "tpu":
        return
    from .isolation import _TPU_METADATA_VARS, _last_resort_tpu_env

    pins = _last_resort_tpu_env()
    for var in _TPU_METADATA_VARS:
        val = os.environ.get(var)
        if (val is None or "WARNING" in val or " " in val) and var in pins:
            os.environ[var] = pins[var]
    triple = {var: os.environ.get(var) for var in _TPU_METADATA_VARS}
    print(f"[probe_worker] TPU metadata env at start: {triple}", file=sys.stderr, flush=True)


def main() -> None:
    _repair_tpu_env()
    spec = json.loads(sys.stdin.read())
    result = run(spec)
    print("MLPT_RESULT:" + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
