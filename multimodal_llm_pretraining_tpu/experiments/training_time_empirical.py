"""Empirical training-time experiment.

Covers the reference experiment (``/root/reference/experiments/
training_time_empirical.py``): a cached 3-step DAG -- largest micro-batch,
measured step time, projected training days -- with the same validity
predicate over the method grid. The execution model is rebuilt around what
TPU/XLA makes possible and what this runtime makes necessary:

- The micro-batch search is driven by a **static AOT fit table**
  (``benchmarking.max_batch_size``): every candidate is compile-checked
  against the HBM budget without executing, so there is no run-and-catch-OOM
  doubling loop in a live process. Only the winning candidate is confirmed
  by really stepping -- in a **disposable worker subprocess**, because a
  runtime RESOURCE_EXHAUSTED poisons this runtime beyond in-process
  recovery (the reference gets the same isolation from torchrunx re-forking
  CUDA workers per probe).
- Step timing also runs in a fresh worker per attempt. A worker that dies
  of OOM halves the micro-batch; a worker that dies lowering a Pallas
  kernel retries once with plain XLA kernels (the torch.compile-timeout
  fallback's honest analog -- and unlike a compile timeout, a Mosaic
  lowering error is deterministic, so exactly one retry).
"""

import inspect
import math
from dataclasses import asdict, dataclass
from typing import Any, TypedDict

from ..benchmarking.isolation import run_probe_worker
from ..benchmarking.max_batch_size import find_max_mbs_pow2, subprocess_confirm
from ..benchmarking.utils import BenchmarkHarness
from ..tpus import device_hbm_bytes
from ..utils import InfrastructureError, get_logger
from .base_classes import Experiment
from .cache import step
from .config import TrainingConfig
from .distribute import distribute
from .slurm import SlurmJob

logger = get_logger()

# Fused-step probes never run more than this many in-program SAMPLE ROWS
# (micro_batch_size x accumulation_steps): one program execution is bounded
# by the backend's per-execution deadline (a full 256-acc pythia-1b step is
# ~2 min inside one program -> ABORTED). 128 rows matches bench.py's proven
# program size (mbs 4 x acc 32, ~15 s at 1b); at mbs 16 the probe drops to
# acc 8 for the same in-program work.
FUSED_PROBE_MAX_ROWS = 128


def _fused_probe_acc(target_acc: int, mbs: int) -> int:
    return max(1, min(target_acc, FUSED_PROBE_MAX_ROWS // max(mbs, 1)))


class BenchmarkingResults(TypedDict):
    micro_batch_size: int  # the arm's mbs (production/fused when measured)
    micro_batch_size_split: int  # mbs the split phases ran at (can be lower)
    step_time: float  # authoritative: fused when measurable, else split
    step_time_split: float | None  # acc_time x acc_steps + optim_time (ref protocol)
    step_time_fused: float | None  # production train_step_fn() at target acc
    compile_disabled: bool


def _static_probe_harness(config: TrainingConfig) -> BenchmarkHarness:
    """A harness used ONLY for AOT compilation (fit table): no device state
    is ever materialized on it, so it is safe in the orchestrating process."""
    plan = config.training_plan(num_training_steps=1, micro_batch_size=1, gradient_accumulation_steps=1)
    plan.configure_compilation_cache()
    return BenchmarkHarness(plan, config.model_class())


@step(cacheable=True, version="004")
def find_largest_batch_size(config: TrainingConfig, limit: int, fused_ground_truth: bool = False) -> int:
    """Largest runnable micro-batch.

    ``fused_ground_truth`` (non-offload arms): candidates the static fit
    table rejects are re-tried by really running the PRODUCTION fused train
    step in a disposable worker -- the static analysis of the standalone
    accumulate program overestimates (no cross-phase buffer reuse) and at 1b
    scale rejects micro-batches the production step runs in 2+ GiB of spare
    HBM. Offload arms keep the plain protocol: their production step IS the
    standalone multi-program schedule the table models."""

    def search() -> int:
        harness = _static_probe_harness(config)
        return find_max_mbs_pow2(
            harness,
            limit=limit,
            hbm_budget_bytes=device_hbm_bytes(config.tpu_type),
            confirm=subprocess_confirm(config),
            upgrade=subprocess_confirm(config, op="confirm_fused") if fused_ground_truth else None,
        )

    return distribute(func=search, workers_per_host=config.chips_per_host)


@step(cacheable=True, version="006")
def benchmark_step_time(
    config: TrainingConfig,
    max_micro_batch_size: int,
    target_micro_batch_size: int,
    num_benchmarking_steps: int,
    trial: int = 0,
    fused_primary: bool = False,
    _run_worker=run_probe_worker,  # injectable for tests
) -> BenchmarkingResults | None:
    """Measured step time at the largest runnable micro-batch.

    Each timing attempt is one disposable worker; the parent only reacts to
    how it ends: OOM -> halve, Pallas lowering failure -> one retry on plain
    XLA kernels, success -> extrapolate acc_time x acc_steps + optim_time.

    ``fused_primary``: the arm's micro-batch was ground-truthed with the
    production fused step (find_largest_batch_size), which fits batches the
    standalone split-phase programs cannot -- the fused probe then runs at
    ``max_micro_batch_size`` even when the split phases had to halve below
    it, and the fused number (at its own mbs) is the arm's measurement.
    """
    del trial  # cache-key salt only
    micro_batch_size = max_micro_batch_size
    plan_overrides: dict[str, Any] = {}

    while micro_batch_size > 0:
        result = _run_worker(
            {
                "op": "time_phases",
                "config": asdict(config),
                "micro_batch_size": micro_batch_size,
                "samples": num_benchmarking_steps,
                "plan_overrides": plan_overrides,
            }
        )
        if result.get("oom"):
            logger.info(f"timing worker OOMed at mbs={micro_batch_size}; halving")
            micro_batch_size //= 2
            continue
        if result.get("lowering_failure"):
            if config.free_lunch and not plan_overrides:
                logger.info("custom-kernel lowering failed in worker; retrying on plain XLA kernels")
                plan_overrides = {"use_custom_kernels": False, "compile": False}
                continue
            raise RuntimeError("kernel lowering failed and no fallback remains")
        if result.get("ok"):
            accumulation_steps = target_micro_batch_size // micro_batch_size
            split_time = result["accumulate_s"] * accumulation_steps + result["optimizer_s"]
            # the fused probe runs at the arm's production micro-batch (can
            # exceed what the standalone split programs fit, fused_primary)
            fused_mbs = max_micro_batch_size if fused_primary else micro_batch_size
            # Fused mode: time the production step in its own worker. The
            # split extrapolation cannot see the overlap XLA's scheduler
            # finds inside one program (round-2 verdict: grids
            # underestimated the production step by ~18%).
            # Offloading arms are exempt: their production step IS the
            # multi-program streamed-update protocol the split probes already
            # measure, and fused timing would re-compile the ~13 grouped
            # host-update programs per arm (~20+ min each on the remote
            # compiler) for no additional signal.
            # The probe caps in-program sample rows (mbs x acc): a single
            # program execution spanning the full target (256 microbatches
            # ~ 2 min at 1b) exceeds the backend's per-execution deadline
            # and ABORTs the device. The accumulation is a scan over
            # identical iterations, so the target-acc time follows linearly
            # from the probe's per-microbatch rate with the measured
            # optimizer phase as the intercept.
            fused_time = None
            if not config.offloading:
                # The fit table and split probes model the standalone
                # accumulate program; the production fused step is a
                # different program whose peak can land on EITHER side (XLA
                # buffer reuse usually shrinks it, but conv/NHWC workloads
                # stack an [acc, ...] batch and im2col workspace the split
                # program never holds -- round-4 convnext arms OOMed the
                # fused probe at the split-approved micro-batch and silently
                # fell back to split timings diverging up to 2.1x). An OOMed
                # fused probe now halves the FUSED micro-batch and re-probes:
                # the arm's production recipe is whatever the fused step
                # actually runs.
                fused = {}
                while fused_mbs >= 1:
                    fused_acc = target_micro_batch_size // fused_mbs
                    probe_acc = _fused_probe_acc(fused_acc, fused_mbs)
                    try:
                        fused = _run_worker(
                            {
                                "op": "time_fused",
                                "config": asdict(config),
                                "micro_batch_size": fused_mbs,
                                "accumulation_steps": probe_acc,
                                "samples": 3,
                                "plan_overrides": plan_overrides,
                            }
                        )
                    except InfrastructureError as e:
                        logger.info(f"fused-step probe hit backend faults; keeping split protocol ({e})")
                        fused = {}
                        break
                    if fused.get("oom"):
                        logger.info(
                            f"fused-step probe OOMed at mbs={fused_mbs} (the static table models the "
                            "standalone program, which under-predicts fused conv/NHWC peaks); halving "
                            "the fused micro-batch"
                        )
                        fused_mbs //= 2
                        fused = {}
                        continue
                    break
                if fused.get("ok"):
                    t_probe = fused["step_time_fused"]
                    optim = min(result["optimizer_s"], 0.5 * t_probe)
                    fused_time = (t_probe - optim) * (fused_acc / probe_acc) + optim
                else:
                    logger.info(f"fused-step timing unavailable ({fused}); keeping split protocol")
            return BenchmarkingResults(
                micro_batch_size=fused_mbs if fused_time is not None else micro_batch_size,
                micro_batch_size_split=micro_batch_size,
                step_time=fused_time if fused_time is not None else split_time,
                step_time_split=split_time,
                step_time_fused=fused_time,
                compile_disabled=bool(plan_overrides),
            )
        raise RuntimeError(f"timing worker returned {result!r}")

    if fused_primary and not config.offloading and max_micro_batch_size > 0:
        # the split-phase programs OOM at every micro-batch but the
        # production fused step was ground-truthed runnable: measure
        # fused-only (no split intercept; scale the whole probe)
        fused_acc = target_micro_batch_size // max_micro_batch_size
        probe_acc = _fused_probe_acc(fused_acc, max_micro_batch_size)
        try:
            fused = _run_worker(
                {
                    "op": "time_fused",
                    "config": asdict(config),
                    "micro_batch_size": max_micro_batch_size,
                    "accumulation_steps": probe_acc,
                    "samples": 3,
                    "plan_overrides": plan_overrides,
                }
            )
        except InfrastructureError:
            fused = {}
        if fused.get("ok"):
            fused_time = fused["step_time_fused"] * (fused_acc / probe_acc)
            return BenchmarkingResults(
                micro_batch_size=max_micro_batch_size,
                micro_batch_size_split=0,
                step_time=fused_time,
                step_time_split=None,  # split protocol infeasible at this scale
                step_time_fused=fused_time,
                compile_disabled=bool(plan_overrides),
            )
    return None


@step(cacheable=True, version="004")
def compute_training_days(benchmarking_results: BenchmarkingResults | None, num_steps: int) -> float | None:
    if benchmarking_results is None:
        return None
    return (num_steps * benchmarking_results["step_time"]) / (24 * 60 * 60)


@dataclass
class TrainingTimeEmpirical(Experiment):
    config: TrainingConfig = None  # type: ignore[assignment]
    benchmarking_steps: int = 3
    trial: int = 0

    def to_dict(self) -> dict[str, Any]:
        return {"trial": self.trial, **self.config.__dict__, "benchmarking_steps": self.benchmarking_steps}

    def __post_init__(self):
        self.model_cls = self.config.model_class()
        self.plan = self.config.training_plan()

    def is_valid(self) -> bool:
        """Method-grid validity predicate (reference ``:161-186`` keeps the
        same rules; the bf16-capability rule passes trivially on TPU)."""
        if any(
            [
                self.benchmarking_steps <= 0,
                self.trial < 0,
                # batch size evenly divisible by total chips
                self.model_cls.batch_size % self.config.num_chips > 0,
                # per-chip batch must be a power of two
                not math.log2(self.model_cls.batch_size // self.config.num_chips).is_integer(),
                self.config.activation_checkpointing and not self.model_cls.supports_activation_checkpointing,
                # checkpoint_policy is a remat knob: without remat only the
                # default label is valid (dedupes the cartesian grid)
                not self.config.activation_checkpointing and self.config.checkpoint_policy != "flash",
                self.model_cls.mixed_precision == "bf16" and not self.config.supports_bf16(),
                # no sharding on a single chip (no-op) unless offloading
                self.config.num_chips == 1 and self.config.sharding != "" and not self.config.offloading,
                # offloading requires sharding
                self.config.offloading and self.config.sharding == "",
                # hybrid methods need >1 host
                "hybrid" in self.config.sharding and self.config.num_hosts <= 1,
                "3++" in self.config.sharding and self.config.num_hosts <= 1,
                # tensor parallel must divide the chips
                self.config.num_chips % self.config.tensor_parallel != 0,
                # bf16 state layouts need bf16 compute and Pallas kernels
                # (free lunch), and are the ALTERNATIVE to the host-offloaded
                # optimizer (master_weights is a no-op under streaming
                # offload -- the combination would duplicate the offload arm).
                # fp16-parity models qualify too: on TPU they execute as bf16
                # (TrainingPlan.compute_dtype), so roberta gets the bf16_sr
                # arms the reference's fp16+loss-scaler recipe has no analog
                # for.
                self.config.state_layout != ""
                and (
                    self.model_cls.mixed_precision not in ("bf16", "fp16")
                    or not self.config.free_lunch
                    or self.config.offloading
                ),
                # layer-stack unrolling is a real arm only for models whose
                # trunk is a scanned layer stack exposing the knob (pythia,
                # mamba); elsewhere the compiled program is identical to the
                # unroll=False arm. Gate on free_lunch like the other
                # compile-level knobs (naive arms never win anyway).
                self.config.unroll_layers
                and (
                    not self.config.free_lunch
                    or "unroll_layers"
                    not in inspect.signature(self.model_cls.build_model).parameters
                ),
            ]
        ):
            return False
        return self.plan.is_valid()

    @property
    def target_micro_batch_size(self) -> int:
        return self.model_cls.batch_size // self.config.num_chips

    @property
    def step_dict(self):
        # Measurement steps key on the canonical single-chip-equivalent
        # config: sharding labels that compile to the same program share one
        # cached measurement (config.measurement_equivalent docstring).
        meas_config = self.config.measurement_equivalent()
        # Non-offload arms ground-truth the micro-batch with the production
        # fused step and report its timing as the arm's measurement. Passed
        # as extra kwargs ONLY for those arms so the cached offload
        # measurements (whose protocol is unchanged) keep their keys.
        fused_kw = {"fused_ground_truth": True} if not meas_config.offloading else {}
        fused_bench_kw = {"fused_primary": True} if not meas_config.offloading else {}
        steps = {}
        steps["max_micro_batch_size"] = find_largest_batch_size(
            config=meas_config, limit=self.target_micro_batch_size, **fused_kw
        )
        steps["benchmarking_results"] = benchmark_step_time(
            config=meas_config,
            max_micro_batch_size=steps["max_micro_batch_size"],
            target_micro_batch_size=self.target_micro_batch_size,
            num_benchmarking_steps=self.benchmarking_steps,
            trial=self.trial,
            **fused_bench_kw,
        )
        steps["training_days"] = compute_training_days(
            benchmarking_results=steps["benchmarking_results"],
            num_steps=self.model_cls.training_steps,
        )
        return steps

    @property
    def slurm_job(self) -> SlurmJob | None:
        return SlurmJob(
            time_min=60,
            num_hosts=self.config.num_hosts,
            mem_per_host_gb=64 * self.config.chips_per_host,
            cpus_per_host=4 * self.config.chips_per_host,
            tpu_type=self.config.tpu_type,
        )

    def results(self):
        br = self.step_result("benchmarking_results")
        out = {
            "max_micro_batch_size": self.step_result("max_micro_batch_size"),
            "training_days": self.step_result("training_days"),
        }
        if isinstance(br, dict):
            out.update(br)
        elif br is not None:  # a StepFailure record; Sweep.results surfaces it
            out["benchmarking_results"] = br
        return out


if __name__ == "__main__":
    TrainingTimeEmpirical.cli()
