"""Largest power-of-2 micro-batch search.

Protocol parity with ``src/benchmarking/max_batch_size.py:11-25`` (double
until failure, return mbs // 2), but the probe is an AOT compile + static
HBM verification instead of running a step and catching a CUDA OOM -- each
probe costs seconds of compile, nothing executes, and an OOM cannot corrupt
the process. The winning size is confirmed with one real training step
(runtime OOM remains possible in rare dynamic-allocation cases).
"""

from ..utils import get_logger
from .utils import BenchmarkHarness, OutOfMemory

logger = get_logger()


def find_max_mbs_pow2(
    harness: BenchmarkHarness,
    limit: int,
    hbm_budget_bytes: int | None = None,
    confirm_with_step: bool = True,
) -> int:
    mbs = 1
    while mbs <= limit:
        logger.info(f"Probing micro-batch size {mbs} (AOT compile + memory check)...")
        if not harness.fits(mbs, hbm_budget_bytes=hbm_budget_bytes):
            break
        mbs *= 2

    # mbs either failed or exceeded limit -> mbs // 2 is the last working size
    best = mbs // 2
    harness.release_probe()  # free probe executables before the real run

    while confirm_with_step and best >= 1:
        try:
            harness.manual_training_step(best, seed=0)
            harness.manual_optimization_step()
            break
        except OutOfMemory:
            logger.info(f"mbs={best} passed static check but OOMed at runtime; rebuilding state and halving")
            best //= 2
            try:
                harness.reset()  # a runtime OOM can poison live buffers
            except OutOfMemory:
                logger.info("state rebuild itself OOMed; giving up on this config")
                return 0

    return best
