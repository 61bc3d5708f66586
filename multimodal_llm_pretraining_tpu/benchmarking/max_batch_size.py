"""Largest power-of-2 micro-batch search.

Same contract as the reference (``src/benchmarking/max_batch_size.py:11-25``:
double until failure, return the last working size), TPU-first mechanics:

1. **Static fit table** -- every candidate is AOT-compiled and checked
   against the HBM budget via XLA's memory analysis. Nothing executes, so
   the parent process is never at risk; on CUDA the only probe is running a
   step and catching the OOM.
2. **Runtime confirmation in a disposable worker** -- XLA's static picture
   can miss dynamic allocations, so the winning candidate runs one real
   step. A runtime RESOURCE_EXHAUSTED poisons this TPU runtime beyond
   in-process recovery, so the confirmation runs in a fresh subprocess
   (``subprocess_confirm``): the worker dies, the parent halves and forks
   another. This is the torchrunx fresh-worker-per-probe model
   (``/root/reference/experiments/utils/distribute.py:37-61``) rebuilt on
   plain subprocesses.
"""

from typing import Callable

from ..utils import get_logger
from .utils import BenchmarkHarness

logger = get_logger()


# Static-vs-runtime calibration band for the fused ground-truth probe: the
# fit table analyzes the STANDALONE accumulate program, whose footprint
# overestimates the production fused step by up to ~21% (pythia-1b dots
# mbs 4: predicted 16.2 GiB, executes in 13.4 -- the buffer reuse inside
# one jit the static picture cannot see). A statically rejected candidate
# whose prediction exceeds budget by MORE than this band cannot be rescued
# by reuse; probing it just burns a multi-minute OOM worker (round-4
# convnext arms each wasted ~4.5 min on upgrade probes at 1.49x budget).
UPGRADE_RATIO_BAND = 1.30


def predicted_fit_table(
    harness: BenchmarkHarness, limit: int, hbm_budget_bytes: int | None = None
) -> tuple[dict[int, bool], dict[int, float | None]]:
    """AOT-compile every power-of-2 candidate up to ``limit`` and record
    whether it fits the HBM budget, plus the predicted/budget ratio (the
    upgrade hook's worth-probing signal). Pure compile-time: safe in-process."""
    table: dict[int, bool] = {}
    ratios: dict[int, float | None] = {}
    mbs = 1
    while mbs <= limit:
        table[mbs], ratios[mbs] = harness.fit_check(mbs, hbm_budget_bytes=hbm_budget_bytes)
        logger.info(f"fit table: mbs={mbs} -> {'fits' if table[mbs] else 'over budget'}")
        if not table[mbs]:
            break
        mbs *= 2
    harness.release_probe()  # free probe executables before any real run
    return table, ratios


def find_max_mbs_pow2(
    harness: BenchmarkHarness,
    limit: int,
    hbm_budget_bytes: int | None = None,
    confirm: Callable[[int], bool] | None = None,
    upgrade: Callable[[int], bool] | None = None,
) -> int:
    """Largest fitting power-of-2 micro-batch size (0 if none fit).

    ``confirm(mbs) -> bool`` optionally validates candidates by really
    running a step; it should be ``subprocess_confirm(...)`` on hardware
    where an OOM can poison the process. Candidates that fail confirmation
    are halved until one passes.

    ``upgrade(mbs) -> bool`` optionally ground-truths candidates the STATIC
    table rejected: the table analyzes the standalone accumulate program,
    which materializes argument/output/temp buffers the production fused
    step reuses inside one jit -- at pythia-1b scale the static picture
    overestimates by ~3 GiB and rejects micro-batches the real training
    step runs comfortably (dots-remat mbs 4 predicts 16.2 GiB but executes
    in 13.4). A disposable worker runs the production step at each rejected
    candidate; doubling continues while it survives (the reference's
    run-and-catch-OOM search has this ground truth built in,
    ``/root/reference/src/benchmarking/max_batch_size.py:11-25``).
    """
    table, ratios = predicted_fit_table(harness, limit, hbm_budget_bytes)
    best = max((m for m, ok in table.items() if ok), default=0)

    while confirm is not None and best >= 1:
        if confirm(best):
            break
        logger.info(f"mbs={best} fit statically but failed at runtime; halving")
        best //= 2

    # whether a candidate was rejected by the static table or refuted by the
    # standalone runtime confirm, the production fused step is a DIFFERENT
    # program with better buffer reuse -- ground-truth it directly. Only
    # candidates within the measured over-prediction band are worth an OOM
    # worker; skip the rest on the static evidence alone.
    while upgrade is not None and best >= 1 and best * 2 <= limit:
        cand = best * 2
        if cand not in ratios:
            # the table stopped at its first rejection; candidates past it
            # need their own static check (an AOT compile is ~5x cheaper
            # than letting a doomed probe worker OOM)
            _, ratios[cand] = harness.fit_check(cand, hbm_budget_bytes=hbm_budget_bytes)
            harness.release_probe()
        ratio = ratios[cand]
        if ratio is not None and ratio > UPGRADE_RATIO_BAND:
            logger.info(
                f"mbs={cand}: static prediction {ratio:.2f}x budget exceeds the "
                f"{UPGRADE_RATIO_BAND}x buffer-reuse band; skipping the fused ground-truth probe"
            )
            break
        if not upgrade(cand):
            break
        logger.info(f"mbs={cand} rejected by the split-program probes but the production step runs it; upgrading")
        best = cand
    return best


def subprocess_confirm(config, dataset_overrides: dict | None = None, op: str = "confirm") -> Callable[[int], bool]:
    """Runtime confirmation in a disposable worker process.

    Returns a ``confirm(mbs)`` callable for ``find_max_mbs_pow2``: True when
    the worker completes the probe step(s), False when it dies of OOM
    (however messily -- the parent process is untouched either way).
    ``op="confirm"`` runs one standalone accumulate + optimizer step;
    ``op="confirm_fused"`` runs one production fused train step (grad-acc 2),
    the ground truth for ``find_max_mbs_pow2``'s ``upgrade`` hook.
    """
    import dataclasses

    from .isolation import run_probe_worker

    def confirm(mbs: int) -> bool:
        spec = {
            "op": op,
            "config": dataclasses.asdict(config),
            "micro_batch_size": mbs,
        }
        if dataset_overrides:
            spec["dataset_overrides"] = dataset_overrides
        result = run_probe_worker(spec)
        if result.get("oom"):
            return False
        if result.get("ok"):
            return True
        raise RuntimeError(f"confirm worker returned {result!r}")

    return confirm


def inprocess_confirm(harness: BenchmarkHarness) -> Callable[[int], bool]:
    """In-process runtime confirmation, for backends where an OOM is a clean
    exception (CPU tests). On real TPU prefer ``subprocess_confirm``."""
    from .utils import OutOfMemory

    def confirm(mbs: int) -> bool:
        if harness.state is None:
            harness.setup()
        try:
            harness.manual_training_step(mbs, seed=0)
            harness.manual_optimization_step()
            return True
        except OutOfMemory:
            harness.reset()
            return False

    return confirm
