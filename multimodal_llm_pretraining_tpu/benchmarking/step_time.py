"""Step timing: accumulation and optimizer phases measured separately.

Protocol parity with ``src/benchmarking/step_time.py:33-97``: N timed steps
with one warmup discarded, phases timed independently, and

    step_time = mean_acc_time * accumulation_steps + mean_optim_time

(the reference's extrapolation at ``:95``). Timing uses wall clock around
fully synced jitted calls (``utils.block_on``; jitted dispatch is async and
``block_until_ready`` alone is unreliable on some PJRT transports).
"""

from ..utils import get_logger
from .utils import BenchmarkHarness, timed

logger = get_logger()


def benchmark_acc_optim_times(
    harness: BenchmarkHarness,
    micro_batch_size: int,
    training_steps: int = 1,
    accumulations: int = 1,
    warmup: bool = False,
) -> tuple[float, float]:
    accumulation_times: list[float] = []
    optimization_times: list[float] = []

    if warmup:
        training_steps += 1

    seed = 0
    for _ in range(training_steps):
        for _ in range(accumulations):
            accumulation_times.append(timed(harness.manual_training_step, micro_batch_size, seed=seed))
            seed += 1
        optimization_times.append(timed(harness.manual_optimization_step))

    if warmup:
        accumulation_times = accumulation_times[accumulations:]
        optimization_times = optimization_times[1:]

    logger.info(f"Accumulation times: {accumulation_times}")
    logger.info(f"Optimization times: {optimization_times}")

    mean_acc_time = sum(accumulation_times) / len(accumulation_times)
    mean_optim_time = sum(optimization_times) / len(optimization_times)
    return mean_acc_time, mean_optim_time


def estimate_step_time(
    harness: BenchmarkHarness,
    micro_batch_size: int,
    target_micro_batch_size: int,
    num_benchmarking_steps: int,
) -> float:
    accumulation_steps = target_micro_batch_size // micro_batch_size

    logger.info(f"Estimating step time for MBS = {micro_batch_size}, ACC = {accumulation_steps}")

    mean_acc_time, mean_optim_time = benchmark_acc_optim_times(
        harness,
        micro_batch_size,
        training_steps=num_benchmarking_steps,
        accumulations=1,
        warmup=True,
    )

    return mean_acc_time * accumulation_steps + mean_optim_time
