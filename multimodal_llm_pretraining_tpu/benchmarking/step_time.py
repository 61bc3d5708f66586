"""Phase timing for one training configuration.

The measured quantities match the reference protocol (reference
``src/benchmarking/step_time.py:33-97``): the accumulate phase (fwd+bwd into
the grad buffer) and the optimizer phase are timed separately, and a full
training step extrapolates as

    step_time = accumulate_s * accumulation_steps + optimizer_s

TPU-specific mechanics differ from a CUDA timer in two ways:

- dispatch is asynchronous and ``block_until_ready`` is unreliable on some
  PJRT transports, so every timed call ends in a hard host sync
  (``utils.block_on``), and per-dispatch tunnel latency (~13 ms here) makes
  single-dispatch timing noisy -- the warmup dispatch is untimed and also
  serves as the compile trigger (remote XLA compile, tens of seconds);
- there is no dataloader to mutate: the harness builds batches per
  micro-batch size directly.
"""

from dataclasses import dataclass

from ..utils import get_logger
from .utils import BenchmarkHarness, timed

logger = get_logger()


@dataclass(frozen=True)
class PhaseTimes:
    """Mean wall-clock seconds per phase over ``samples`` measured steps."""

    accumulate_s: float
    optimizer_s: float
    samples: int

    def step_time(self, accumulation_steps: int) -> float:
        return self.accumulate_s * accumulation_steps + self.optimizer_s


def measure_phase_times(harness: BenchmarkHarness, micro_batch_size: int, samples: int = 3) -> PhaseTimes:
    """Time ``samples`` (accumulate, optimize) pairs after one untimed
    warmup pair (which triggers compilation of both programs).

    Batch synthesis + host->device transfer happen BEFORE each timed call
    (reference protocol: pre-fetched inputs, ``step_time.py:47-58``)."""
    assert samples >= 1
    harness.manual_training_step(micro_batch_size, seed=0)
    harness.manual_optimization_step()

    acc_total = 0.0
    opt_total = 0.0
    for i in range(samples):
        prefetched = harness.prefetch_micro_batch(micro_batch_size, seed=i + 1)
        acc_total += timed(harness.manual_training_step, micro_batch_size, prefetched=prefetched)
        opt_total += timed(harness.manual_optimization_step)
    times = PhaseTimes(acc_total / samples, opt_total / samples, samples)
    logger.info(
        f"phase times @ mbs={micro_batch_size}: accumulate {times.accumulate_s:.4f}s, "
        f"optimizer {times.optimizer_s:.4f}s (n={samples})"
    )
    return times


def measure_fused_step_time(session, accumulation_steps: int, samples: int = 3) -> float:
    """Time the PRODUCTION fused step (``TrainSession.train_step_fn``) at the
    target accumulation count.

    The split protocol above mirrors the reference's measurement; this mode
    measures what training actually runs -- one XLA program in which the
    latency-hiding scheduler overlaps collectives/offload transfers with
    compute, which the acc x split-accumulate extrapolation cannot see
    (round-2 verdict: the committed grids underestimated the production step
    by ~18% and ranked remat policies backwards). ``session.plan`` must
    already carry the target micro_batch_size / gradient_accumulation_steps.
    """
    from ..utils import block_on

    assert session.plan.gradient_accumulation_steps == accumulation_steps
    state = session.init_state()
    fn = session.train_step_fn()
    import jax

    # TWO untimed warmups: the first triggers the (remote) compile; the
    # second still carries program-load/tuning overhead on this backend
    # (~20% once observed on the executions right after compile)
    for w in range(2):
        batch = session.make_train_batch(seed=w)
        rng = jax.device_put(jax.random.key(w), session.repl_sharding)
        block_on((batch, rng))
        state, metrics = fn(state, batch, rng)
        block_on((state.params, metrics))

    times = []
    for i in range(samples):
        batch = session.make_train_batch(seed=i + 2)
        rng = jax.device_put(jax.random.key(i + 2), session.repl_sharding)
        block_on((batch, rng))

        def one_step():
            nonlocal state
            state, m = fn(state, batch, rng)
            block_on((state.params, m))

        times.append(timed(one_step))
    fused = sorted(times)[len(times) // 2]  # median (bench.py protocol)
    logger.info(f"fused step @ acc={accumulation_steps}: {fused:.4f}s (median of {samples})")
    return fused


def estimate_step_time(
    harness: BenchmarkHarness,
    micro_batch_size: int,
    target_micro_batch_size: int,
    num_benchmarking_steps: int,
) -> float:
    """Full-step seconds at ``micro_batch_size``, extrapolated to the
    gradient-accumulation count that reaches ``target_micro_batch_size``."""
    accumulation_steps = target_micro_batch_size // micro_batch_size
    times = measure_phase_times(harness, micro_batch_size, samples=num_benchmarking_steps)
    return times.step_time(accumulation_steps)
