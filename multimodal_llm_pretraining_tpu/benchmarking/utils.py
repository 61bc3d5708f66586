"""Benchmark harness: the ``ManualTrainer`` analog.

The reference hijacks HF ``Trainer`` so it can drive accumulation and
optimizer phases by hand (``src/benchmarking/utils.py:40-80``). Here those
phases are separate jitted functions already (``TrainSession.accumulate_fn``
/ ``optimizer_update_fn``), so the harness only owns state, per-mbs compile
caches, wall-clock timing (with hard device sync), and OOM classification.

TPU improvement over CUDA try/except OOM probing: XLA statically verifies
HBM fit at compile time, so ``fits(mbs)`` is answered by an AOT compile --
seconds, no step execution, no risk of poisoning the live process
(SURVEY.md section 7 "hard parts").
"""

import time

import jax

from ..train import TrainingPlan
from ..training.step import TrainSession
from ..utils import block_on, get_logger

logger = get_logger()

_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Ran out of memory", "memory space hbm", "Exceeded hbm capacity", "out of memory")


def is_oom_error(e: BaseException) -> bool:
    return any(m in str(e) for m in _OOM_MARKERS)


class OutOfMemory(Exception):
    """Normalized OOM signal (the ``torch.cuda.OutOfMemoryError`` analog)."""


class BenchmarkHarness:
    def __init__(self, plan: TrainingPlan, model_class, devices=None):
        self.plan = plan
        self.model_class = model_class
        self.session = TrainSession(plan, model_class, devices=devices)
        self.state = None
        self.grads = None
        self._acc_compiled: dict[int, object] = {}

    # ------------------------------------------------------------ state

    def setup(self) -> None:
        """Materialize params + optimizer state (the trainer.train()-until-
        ForceExit analog: all expensive setup happens here, not in timing)."""
        try:
            self.state = self.session.init_state()
            self.grads = self.session.zero_grads()
            block_on(self.state.params)
        except Exception as e:
            if is_oom_error(e):
                raise OutOfMemory(str(e)) from e
            raise

    # ------------------------------------------------------------ memory

    def persistent_state_bytes(self) -> int:
        """Per-device HBM bytes of live state the accumulate program does NOT
        see as arguments (optimizer state): XLA's compile-time check misses
        these, so the budget check must add them. Host-offloaded optimizer
        state lives in pinned host memory and costs no HBM."""
        from ..parallel.sharding import host_offload_supported, shard_bytes_per_device

        if self.session.policy.offload_optimizer and host_offload_supported():
            return 0
        opt_shapes = jax.eval_shape(self.session.tx.init, self.session.param_shapes)
        return shard_bytes_per_device(opt_shapes, self.session.mesh, self.session.policy.opt_state)

    def reset(self) -> None:
        """Delete and rebuild device state after a runtime OOM (a failed
        execution can leave the allocator poisoned; dropping every live
        buffer and re-initializing is the only in-process recovery)."""
        for tree in (self.state, self.grads):
            for leaf in jax.tree.leaves(tree):
                try:
                    leaf.delete()
                except Exception:
                    pass
        self._acc_compiled.clear()
        self._jitted_cleanup()
        self.setup()

    def _jitted_cleanup(self) -> None:
        self.session._jitted.clear()

    def analytic_floor_bytes(self) -> int:
        """Per-device HBM bytes resident at ANY micro-batch size: live params
        (unless host-offloaded), gradient accumulators, and persistent
        optimizer state. Pure eval_shape -- no compile, no execution."""
        from ..parallel.sharding import host_offload_supported, shard_bytes_per_device

        floor = self.persistent_state_bytes()
        floor += shard_bytes_per_device(self.session.grad_shapes, self.session.mesh, self.session.policy.grads)
        if not (self.session.policy.offload_params and host_offload_supported()):
            floor += shard_bytes_per_device(self.session.param_shapes, self.session.mesh, self.session.policy.params)
        return floor

    def fits(self, micro_batch_size: int, hbm_budget_bytes: int | None = None, safety: float = 0.94) -> bool:
        return self.fit_check(micro_batch_size, hbm_budget_bytes, safety)[0]

    def fit_check(
        self, micro_batch_size: int, hbm_budget_bytes: int | None = None, safety: float = 0.94
    ) -> tuple[bool, float | None]:
        """Static fit check: AOT-compile the accumulate step for this mbs.

        Three gates, none of which executes anything:
        0. analytic state floor (params + grad accumulators + optimizer
           state, eval_shape only) against the budget -- arms whose state
           alone oversubscribes HBM (e.g. mamba-2.8b on one 16 GB chip)
           are rejected without paying a multi-minute remote AOT compile;
        1. XLA's own compile-time HBM verification (raises on oversize);
        2. memory_analysis + persistent state (optimizer buffers) against
           ``safety *`` the HBM budget -- covers what gate 1 cannot see.

        Returns ``(fits, predicted/budget ratio)``: the ratio quantifies HOW
        FAR over budget a rejected candidate is (``inf`` for the no-analysis
        rejections -- state floor and compile-time OOM -- which buffer reuse
        can never rescue; ``None`` when no memory analysis is available),
        so the search can decide whether a fused ground-truth probe is worth
        an OOM worker (``max_batch_size.UPGRADE_RATIO_BAND``)."""
        if hbm_budget_bytes is None:
            from ..tpus import device_hbm_bytes

            hbm_budget_bytes = device_hbm_bytes()
        floor = self.analytic_floor_bytes()
        if floor > int(hbm_budget_bytes * safety):
            logger.info(
                f"mbs={micro_batch_size}: analytic state floor {floor / 2**30:.2f} GiB "
                f"exceeds budget {hbm_budget_bytes * safety / 2**30:.2f} GiB (no compile needed)"
            )
            return False, float("inf")
        try:
            compiled = self._compile_acc(micro_batch_size)
        except Exception as e:
            if is_oom_error(e):
                logger.info(f"mbs={micro_batch_size}: compile-time OOM")
                return False, float("inf")
            raise
        usage = self.predicted_bytes(compiled)
        if usage is not None:
            required = usage + self.persistent_state_bytes()
            budget = int(hbm_budget_bytes * safety)
            logger.info(
                f"mbs={micro_batch_size}: predicted {required / 2**30:.2f} GiB (program {usage / 2**30:.2f} + state) vs budget {budget / 2**30:.2f} GiB"
            )
            return required <= budget, required / budget
        return True, None

    @staticmethod
    def predicted_bytes(compiled) -> int | None:
        try:
            ma = compiled.memory_analysis()
            if ma is None:
                return None
            return int(
                getattr(ma, "argument_size_in_bytes", 0)
                + getattr(ma, "output_size_in_bytes", 0)
                + getattr(ma, "temp_size_in_bytes", 0)
                + getattr(ma, "generated_code_size_in_bytes", 0)
                - getattr(ma, "alias_size_in_bytes", 0)
            )
        except Exception:
            return None

    def _compile_acc(self, micro_batch_size: int):
        if micro_batch_size not in self._acc_compiled:
            self._acc_compiled[micro_batch_size] = self.session.lower_accumulate(micro_batch_size).compile()
        return self._acc_compiled[micro_batch_size]

    # ------------------------------------------------------------ stepping

    def prefetch_micro_batch(self, micro_batch_size: int, seed: int = 0):
        """Synthesize + device_put one microbatch and its rng OUTSIDE any
        timed region (the reference times with pre-fetched inputs,
        ``src/benchmarking/step_time.py:47-58``); blocks until resident."""
        batch = self.session.make_micro_batch(micro_batch_size, seed=seed)
        rng = jax.device_put(jax.random.key(seed), self.session.repl_sharding)
        block_on((batch, rng))
        return batch, rng

    def manual_training_step(self, micro_batch_size: int, seed: int = 0, prefetched=None) -> None:
        """One fwd+bwd microstep accumulated into the grad buffer
        (``manual_training_step`` parity, ``src/benchmarking/utils.py:61-63``).

        Pass ``prefetched=(batch, rng)`` from :meth:`prefetch_micro_batch`
        when timing, so host synthesis + transfer stay untimed."""
        assert self.state is not None, "call setup() first"
        try:
            batch, rng = prefetched if prefetched is not None else self.prefetch_micro_batch(micro_batch_size, seed)
            fn = self._compile_acc(micro_batch_size)
            self.grads, loss = fn(self.state.params, self.grads, batch, rng)
            block_on((self.grads, loss))
        except Exception as e:
            if is_oom_error(e):
                raise OutOfMemory(str(e)) from e
            raise

    def manual_optimization_step(self) -> None:
        """Clip + optimizer + schedule + grad reset
        (``manual_optimization_step`` parity, ``src/benchmarking/utils.py:65-80``)."""
        assert self.state is not None and self.grads is not None
        try:
            fn = self.session.optimizer_update_fn()
            params, opt_state = fn(self.state.params, self.state.opt_state, self.grads, 1.0)
            self.state = self.state.replace(params=params, opt_state=opt_state, step=self.state.step + 1)
            self.grads = self.session.zero_grads()
            block_on(self.state.params)
        except Exception as e:
            if is_oom_error(e):
                raise OutOfMemory(str(e)) from e
            raise

    def release_probe(self, micro_batch_size: int | None = None) -> None:
        """Drop cached probe executables (frees their device workspace)."""
        if micro_batch_size is None:
            self._acc_compiled.clear()
        else:
            self._acc_compiled.pop(micro_batch_size, None)


def timed(fn, *args, **kwargs) -> float:
    """perf_timer analog (``src/benchmarking/step_time.py:14-18``); callee is
    responsible for device sync (all harness steps end with ``block_on``)."""
    t0 = time.perf_counter()
    fn(*args, **kwargs)
    return time.perf_counter() - t0
