"""Real-training driver loop: the HF ``Trainer.train()`` replacement.

The reference's training entry builds a HF Trainer over a dataset+collator
and calls ``train()`` (``scripts/training.py:73-104``). Here the loop is
explicit and small because all the heavy machinery lives in the jitted step:

  for step: host collate (threaded prefetch) -> device_put (sharded) ->
            fused train_step -> periodic log / orbax checkpoint

Input pipeline: a background thread keeps ``prefetch`` batches ahead of the
device so collation (tokenization, image decode) overlaps the accelerator
step -- the data path never blocks the MXUs on CPU work.
"""

import queue
import threading
import time
from typing import Any, Callable, Iterable

import jax
import numpy as np

from ..utils import block_on, get_logger
from .step import TrainSession

logger = get_logger()


class DataLoader:
    """Minimal map-style loader: shuffle indices, collate, prefetch."""

    def __init__(self, dataset, batch_size: int, collate_fn: Callable | None = None, seed: int = 0, prefetch: int = 2, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn or default_collate
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            rng = np.random.default_rng(self.seed)
            epoch = 0
            while not stop.is_set():
                order = rng.permutation(len(self.dataset))
                for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
                    if stop.is_set():
                        return
                    idx = order[start : start + self.batch_size]
                    examples = [self.dataset[int(i)] for i in idx]
                    q.put(self.collate_fn(examples))
                epoch += 1

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()


def default_collate(examples: list[dict]) -> dict[str, np.ndarray]:
    out = {}
    for k in examples[0]:
        out[k] = np.stack([np.asarray(e[k]) for e in examples])
    return out


class SyntheticLoader:
    """Loader over a DummyDataset's fast batch synthesis."""

    def __init__(self, dataset, batch_size: int, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed

    def __iter__(self):
        i = self.seed
        while True:
            yield self.dataset.sample_batch(self.batch_size, seed=i)
            i += 1


class Trainer:
    def __init__(
        self,
        session: TrainSession,
        output_dir: str | None = None,
        save_steps: int = 1000,
        log_steps: int = 10,
        dataset=None,
        collate_fn: Callable | None = None,
        resume: bool = True,
        seed: int = 0,
        profile_dir: str | None = None,
        init_params_from: str | None = None,
    ):
        self.session = session
        self.plan = session.plan
        self.output_dir = output_dir
        self.save_steps = save_steps
        self.log_steps = log_steps
        self.resume = resume
        self.seed = seed
        self.profile_dir = profile_dir  # jax.profiler trace of steps 2-4
        self.init_params_from = init_params_from  # pretrain->finetune chain

        acc = self.plan.gradient_accumulation_steps
        self.examples_per_step = acc * session.global_micro_batch_size()
        if dataset is None:
            self.loader: Iterable = SyntheticLoader(session.dataset, self.examples_per_step, seed=seed)
        else:
            self.loader = DataLoader(dataset, self.examples_per_step, collate_fn=collate_fn, seed=seed)

        self.checkpointer = None
        if output_dir:
            from .checkpoint import Checkpointer

            self.checkpointer = Checkpointer(output_dir)

    def _to_device(self, host_batch: dict[str, np.ndarray]) -> dict[str, Any]:
        acc = self.plan.gradient_accumulation_steps
        out = {}
        for k, v in host_batch.items():
            v = np.asarray(v)
            # per-key leading dim: ViLT's itm_* arrays are 2x batch
            per_micro = v.shape[0] // acc
            v = v.reshape(acc, per_micro, *v.shape[1:])
            out[k] = self.session.put_batch_array(v, leading_acc_dim=True)
        return out

    def train(self, max_steps: int | None = None) -> dict[str, float]:
        state = self.session.init_state(seed=self.seed)
        resumed = False
        if self.checkpointer is not None and self.resume:
            latest = self.checkpointer.latest_step()
            if latest is not None:
                state = self.checkpointer.restore(state)
                resumed = True
        if self.init_params_from and not resumed:
            # start this phase from another run's final params (fresh
            # optimizer state and step counter)
            from .checkpoint import restore_params

            params = restore_params(self.init_params_from, state.params)
            state = state.replace(params=jax.device_put(params, self.session.param_sharding))

        step_fn = self.session.train_step_fn()
        rng = jax.random.key(self.seed)
        total = max_steps if max_steps is not None else self.plan.num_training_steps
        start_step = int(state.step)

        it = iter(self.loader)
        t_last = time.perf_counter()
        metrics = {}
        for i in range(start_step, total):
            # profiler trace as a value-add over the reference's wall-clock-only
            # observability (SURVEY.md section 5.1)
            if self.profile_dir and i == start_step + 1:
                jax.profiler.start_trace(self.profile_dir)
            batch = self._to_device(next(it))
            state, metrics = step_fn(state, batch, rng)
            if self.profile_dir and i == start_step + 3:
                block_on(metrics)
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {self.profile_dir}")
            if (i + 1) % self.log_steps == 0 or i + 1 == total:
                block_on(metrics)
                dt = (time.perf_counter() - t_last) / self.log_steps
                t_last = time.perf_counter()
                tokens = self.examples_per_step * getattr(self.session.dataset, "sequence_length", 1)
                logger.info(
                    f"step {i + 1}/{total} loss={float(metrics['loss']):.4f} "
                    f"step_time={dt:.3f}s throughput={tokens / dt:.0f} tok/s"
                )
            if self.checkpointer is not None and (i + 1) % self.save_steps == 0:
                block_on(state.params)
                self.checkpointer.save(i + 1, state)
        if self.checkpointer is not None:
            block_on(state.params)
            self.checkpointer.save(total, state)
            self.checkpointer.wait()
        self.final_state = state
        return {k: float(v) for k, v in metrics.items()}
