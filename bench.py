"""Headline benchmark: pythia-1b tokens/sec/chip, all-on-device bf16 state.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

pythia-1b is the model BASELINE.md names for the north-star target (>=45%
MFU). Round-3 recipe: the ENTIRE training state lives on the one v5e --
bf16 live params updated with stochastic rounding (no f32 master,
master_weights="sr"), bf16 stored Adam moments (opt_state_dtype, fused
per-leaf update), bf16 grad accumulators, save-dots remat at mbs 4. That
replaces round 2's streaming host-offload optimizer (and its ~1.5 s/step
host round-trip): the optimizer update now costs ~0.1 s in-jit.

The headline is measured at the WORKLOAD's global batch (1024 = mbs 4 x
grad-acc 256, ref ``src/models/pythia.py:25-30``): since one acc-256
execution would trip this backend's ~30 s per-execution deadline, the step
runs as 8 chained acc-32 grads-only executions carrying the accumulator
in place plus one optimizer update -- a true measurement with all dispatch
overhead included, not an extrapolation. The acc-32 fused production step
is reported alongside in ``detail``.

vs_baseline compares achieved model-FLOPs utilization against the 45% MFU
target (BASELINE.md): vs_baseline = MFU / 0.45. MFU uses the analytic dense
fwd+bwd FLOPs (remat recompute not credited) against the chip's datasheet
peak bf16 FLOPS from the registry (the reference's analytic peak-TFLOPS
table analog, ``experiments/training_time_analytic.py:24-47``).
"""

import contextlib
import json
import os
import signal
import time

import jax


def _descendants(root_pid):
    """All live descendant pids of ``root_pid`` (via /proc, no pattern match)."""
    children = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                ppid = int(f.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            continue
        children.setdefault(ppid, []).append(int(pid))
    out, stack = [], [root_pid]
    while stack:
        for c in children.get(stack.pop(), []):
            out.append(c)
            stack.append(c)
    return out


@contextlib.contextmanager
def _chain_paused():
    """SIGSTOP the round-5 sweep chain (pid file, never pattern-matched) for
    the duration of the benchmark so the measurement sees a quiet chip + host
    (CLAUDE.md: two TPU processes contend on the tunnel; CPU work on the one
    host core skews timings 20-40%). SIGCONT restores it afterwards."""
    pids = []
    try:
        with open("/tmp/chain_r5.pid") as f:
            root = int(f.read().strip())
        os.kill(root, 0)  # alive?
        pids = [root] + _descendants(root)
    except (OSError, ValueError):
        pids = []
    if not pids:
        yield
        return
    stopped = []
    try:
        for p in pids:
            try:
                os.kill(p, signal.SIGSTOP)
                stopped.append(p)
            except OSError:
                pass
        time.sleep(10)  # let any in-flight device program drain
        yield
    finally:
        for p in reversed(stopped):
            try:
                os.kill(p, signal.SIGCONT)
            except OSError:
                pass


def main():
    from multimodal_llm_pretraining_tpu.models import get_model_class
    from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
    from multimodal_llm_pretraining_tpu.tpus import detect_local_tpu, peak_tflops
    from multimodal_llm_pretraining_tpu.train import TrainingPlan
    from multimodal_llm_pretraining_tpu.utils import block_on

    model_type = "pythia-1b"
    mc = get_model_class(model_type)
    n_chips = len(jax.devices())

    micro_batch_size = 4
    acc_steps = 32
    plan = TrainingPlan(
        num_training_steps=8,
        micro_batch_size=micro_batch_size,
        gradient_accumulation_steps=acc_steps,
        activation_checkpointing=True,
        # A/B gate for remat-policy comparisons on the live chip (the grid
        # ranks flash/dots/none within 0.9% on this stack; default follows
        # the committed headline recipe)
        checkpoint_policy=os.environ.get("MLPT_BENCH_CKPT", "dots"),
        bf16=True,
        compile=True,
        use_custom_kernels=True,
        matmul_precision="default",
        optimizer=mc.optimizer,
        optimizer_kwargs=mc.optimizer_kwargs,
        scheduler_type=mc.scheduler_type,
        scheduler_kwargs=mc.scheduler_kwargs,
        grad_accum_dtype="bf16",
        opt_state_dtype="bf16",
        master_weights="sr",
        unroll_layers=True,
        max_grad_norm=mc.max_grad_norm,
        mesh=MeshConfig(num_hosts=1, chips_per_host=n_chips),
    )
    sess = plan.build_session(mc)
    state = sess.init_state()
    step = sess.train_step_fn()

    # warmup (compile + settle)
    for i in range(2):
        state, metrics = step(state, sess.make_train_batch(seed=i), jax.random.key(0))
        block_on((state.params, metrics))

    times = []
    for i in range(2, 5):
        batch = sess.make_train_batch(seed=i)
        block_on(batch)
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.key(0))
        block_on((state.params, metrics))
        times.append(time.perf_counter() - t0)

    step_time = sorted(times)[len(times) // 2]  # median

    # Workload-scale measurement. The pythia-1b workload trains at global
    # batch 1024 (ref ``src/models/pythia.py:25-30``) = mbs 4 x acc 256 on
    # one chip, but a single acc-256 execution trips this backend's
    # per-execution deadline (~30 s -> ABORTED). So the workload step runs
    # as ``wl_chunks`` chained acc-32 grads-only executions carrying the
    # accumulator buffer in place, then one optimizer update with
    # acc_steps=256: a true measured global-batch-1024 step including every
    # dispatch, not a linear extrapolation.
    wl_chunks = 8
    wl_acc = acc_steps * wl_chunks
    gfn = sess.grads_fn()
    update = sess.optimizer_update_fn()
    params, opt_state = state.params, state.opt_state

    def workload_step(params, opt_state, step_seed, seed0):
        grads = sess.zero_grads()
        # chunk rngs fold the chunk index from ONE per-step key, so the
        # chained protocol stays trajectory-equivalent to a fused acc-256
        # step for rng-consuming models too (pythia itself is dropout-free)
        step_key = jax.random.key(step_seed)
        for j in range(wl_chunks):
            grads, _loss = gfn(params, grads, wl_batches[(seed0 + j) % len(wl_batches)], jax.random.fold_in(step_key, j), state.step)
        return update(params, opt_state, grads, float(wl_acc))

    wl_batches = [sess.make_train_batch(seed=100 + j) for j in range(wl_chunks)]
    block_on(wl_batches)
    params, opt_state = workload_step(params, opt_state, 0, 0)  # compile + settle
    block_on(params)
    wl_times = []
    for i in range(3):  # median of 3, same protocol as the fused metric
        t0 = time.perf_counter()
        params, opt_state = workload_step(params, opt_state, 1 + i, i)
        block_on(params)
        wl_times.append(time.perf_counter() - t0)
    wl_step_time = sorted(wl_times)[len(wl_times) // 2]

    tokens_per_step = micro_batch_size * wl_acc * n_chips * mc.sequence_length
    tokens_per_sec_per_chip = tokens_per_step / wl_step_time / n_chips

    # MFU from the analytic dense-transformer FLOPs count (XLA cost_analysis
    # under-reports through Pallas kernels and some PJRT transports)
    from multimodal_llm_pretraining_tpu.benchmarking.flops import analytic_flops_per_example

    # standard MFU: useful fwd+bwd FLOPs only (remat recompute is overhead,
    # not model work)
    flops_per_example = analytic_flops_per_example(mc, backward=True, remat=False)
    mfu = wl_mfu = None
    tpu_type = detect_local_tpu()
    if flops_per_example and tpu_type:
        peak = peak_tflops(tpu_type, "bf16")
        mfu = flops_per_example * micro_batch_size * acc_steps / step_time / 1e12 / peak
        wl_mfu = flops_per_example * micro_batch_size * wl_acc / wl_step_time / 1e12 / peak

    vs_baseline = (wl_mfu / 0.45) if wl_mfu else None
    print(
        json.dumps(
            {
                "metric": f"{model_type} tokens/sec/chip (workload global batch 1024; all-on-device bf16 state, SR params, save-dots remat)",
                "value": round(tokens_per_sec_per_chip, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(vs_baseline, 4) if vs_baseline else None,
                "detail": {
                    "workload_step_time_s": round(wl_step_time, 4),
                    "workload_mfu": round(wl_mfu, 4) if wl_mfu else None,
                    "workload_grad_accumulation": wl_acc,
                    "fused_acc32_step_time_s": round(step_time, 4),
                    "fused_acc32_mfu": round(mfu, 4) if mfu else None,
                    "tpu": tpu_type,
                    "n_chips": n_chips,
                    "micro_batch_size": micro_batch_size,
                    "loss": round(float(metrics["loss"]), 4),
                },
            }
        )
    )


if __name__ == "__main__":
    with _chain_paused():
        main()
