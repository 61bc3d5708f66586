"""Residual accounting for the pythia-1b headline step (VERDICT r3 item 3).

Decomposes the production fused step (headline recipe: mbs 4, acc 32,
save-dots remat, bf16 SR state, unrolled layers) into measured segments and
attributes the gap between achieved workload MFU and the chip's measured
sustained matmul ceiling (162.5 TFLOPS, ``artifacts/matmul_ceiling_v5e.json``):

  full step       = fwd + (bwd incl. remat recompute) + optimizer + dispatch
  fwd-only        : jitted scan of the loss over the same 32 microbatches
  grads-only      : the production accumulate scan (fwd+bwd)
  optimizer       : full - grads (cross-checked against an isolated update)
  attention f+b   : standalone production-shape flash kernel loop (B4 H8
                    S2048 D256), the shape CLAUDE.md names as the residual
  HBM stream      : chained elementwise loop -> achieved GB/s vs 819 datasheet

Writes ``artifacts/pythia-1b_profile_v5e.json``. Run on a QUIET host/chip.

Usage: python scripts/profile_residual.py [--mbs 4] [--acc 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multimodal_llm_pretraining_tpu.benchmarking.flops import analytic_flops_per_example
from multimodal_llm_pretraining_tpu.models import get_model_class
from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
from multimodal_llm_pretraining_tpu.tpus import detect_local_tpu, peak_tflops
from multimodal_llm_pretraining_tpu.train import TrainingPlan
from multimodal_llm_pretraining_tpu.utils import block_on

SUSTAINED_TFLOPS = 162.5  # measured: artifacts/matmul_ceiling_v5e.json


def median(xs):
    return sorted(xs)[len(xs) // 2]


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    block_on(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        block_on(out)
        ts.append(time.perf_counter() - t0)
    return median(ts), out


def hbm_stream_gbps(bytes_total=2 << 30, iters=16):
    """Achieved HBM read+write bandwidth for a chained elementwise op."""
    n = bytes_total // 2  # bf16
    x = jnp.ones((n,), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(x, _):
            return x * 1.0001 + 1.0, None

        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x

    block_on(run(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        block_on(run(x))
        ts.append(time.perf_counter() - t0)
    t = median(ts) / iters
    return 2 * bytes_total / t / 1e9  # read + write per iter


def attention_fwdbwd_seconds(b, h, s, d, iters=16):
    from multimodal_llm_pretraining_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True).astype(jnp.float32))

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(carry, _):
            q, k, v = carry
            dq, dk, dv = grad(q, k, v)
            q = q + 0.0 * dq[..., :1, :1].sum().astype(q.dtype)
            return (q, k, v), None

        (q, k, v), _ = jax.lax.scan(body, (q, k, v), None, length=iters)
        return q[0, 0, 0, 0]

    block_on(run(q, k, v))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        block_on(run(q, k, v))
        ts.append(time.perf_counter() - t0)
    return median(ts) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbs", type=int, default=4)
    ap.add_argument("--acc", type=int, default=32)
    ap.add_argument("--out", default=os.path.join("artifacts", "pythia-1b_profile_v5e.json"))
    args = ap.parse_args()

    mc = get_model_class("pythia-1b")
    plan = TrainingPlan(
        num_training_steps=8,
        micro_batch_size=args.mbs,
        gradient_accumulation_steps=args.acc,
        activation_checkpointing=True,
        checkpoint_policy="dots",
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
        mesh=MeshConfig(num_hosts=1, chips_per_host=1),
    )
    sess = plan.build_session(mc)
    state = sess.init_state()
    batch = sess.make_train_batch(seed=0)
    block_on(batch)
    rng = jax.random.key(0)

    # --- full fused production step. The step donates the state buffers, so
    # each timed call must rethread the returned state (reusing the original
    # donated arrays kills the execution with INVALID_ARGUMENT on this
    # backend instead of a clear donation error).
    step = sess.train_step_fn()
    state, metrics = step(state, batch, rng)
    block_on((state.params, metrics))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, rng)
        block_on((state.params, metrics))
        ts.append(time.perf_counter() - t0)
    t_full = median(ts)
    print(f"full step      : {t_full:8.3f} s", flush=True)

    # Free the fused-step executable and the optimizer state before compiling
    # the next segment: two resident ~13 GiB programs OOM the 16 GiB chip.
    params, step_no = state.params, state.step
    del state, metrics
    sess._jitted.pop("step").clear_cache()
    jax.clear_caches()

    # --- grads-only (the accumulate scan exactly as the step runs it)
    gfn = sess.grads_fn()
    t_grads, grads_out = timeit(lambda: gfn(params, sess.zero_grads(), batch, rng, step_no))
    del grads_out
    sess._jitted.pop("grads").clear_cache()
    jax.clear_caches()
    print(f"grads-only     : {t_grads:8.3f} s", flush=True)

    # --- fwd-only: same microbatch scan, loss only (no grad, no remat cost)
    def fwd_all(params, batch, rng):
        def micro(tot, mb):
            loss, _metrics = sess._loss(params, mb, rng)
            return tot + loss.astype(jnp.float32), None

        tot, _ = jax.lax.scan(micro, jnp.float32(0.0), batch)
        return tot

    fwd_jit = jax.jit(fwd_all)
    t_fwd, _ = timeit(lambda: fwd_jit(params, batch, rng))
    del params, batch
    fwd_jit.clear_cache()
    jax.clear_caches()
    print(f"fwd-only       : {t_fwd:8.3f} s", flush=True)

    # --- attention standalone at the production shape (whole-step worth:
    # 16 layers x acc microbatches at [mbs, 8 heads, 2048, 256])
    t_attn1 = attention_fwdbwd_seconds(args.mbs, 8, 2048, 256)
    layers, acc = 16, args.acc
    t_attn_step = t_attn1 * layers * acc
    print(f"attention f+b  : {t_attn1*1e3:8.2f} ms/layer-micro -> {t_attn_step:6.3f} s/step equivalent", flush=True)

    # --- HBM stream
    gbps = hbm_stream_gbps()
    print(f"hbm stream     : {gbps:8.1f} GB/s (datasheet 819)", flush=True)

    # --- accounting
    tpu = detect_local_tpu() or "v5e"
    peak = peak_tflops(tpu, "bf16")
    S = mc.sequence_length
    fl_fwdbwd = analytic_flops_per_example(mc, backward=True, remat=False)
    fl_fwd = analytic_flops_per_example(mc, backward=False, remat=False)
    tokens = args.mbs * args.acc
    ex = tokens  # examples per step
    # attention-only analytic FLOPs (causal): fwd 2 matmuls, bwd 5 (fused kernel)
    attn_fwd = 4 * args.mbs * 8 * S * S * 256 / 2
    attn_fwdbwd = attn_fwd * 3.5 * layers * acc
    t_bwd = t_grads - t_fwd
    t_opt = t_full - t_grads

    def tflops(f, t):
        return f / t / 1e12

    report = {
        "recipe": "mbs %d acc %d save-dots remat, bf16 SR state, unrolled, fused flash bwd" % (args.mbs, args.acc),
        "tpu": tpu,
        "datasheet_peak_tflops": peak,
        "sustained_matmul_ceiling_tflops": SUSTAINED_TFLOPS,
        "segments_s": {
            "full_step": round(t_full, 4),
            "grads_scan": round(t_grads, 4),
            "fwd_only": round(t_fwd, 4),
            "bwd_incl_remat": round(t_bwd, 4),
            "optimizer_update": round(t_opt, 4),
            "attention_fwdbwd_equiv": round(t_attn_step, 4),
        },
        "achieved_tflops": {
            "full_step_model_flops": round(tflops(fl_fwdbwd * ex, t_full), 1),
            "fwd_only": round(tflops(fl_fwd * ex, t_fwd), 1),
            "bwd_model_flops": round(tflops((fl_fwdbwd - fl_fwd) * ex, t_bwd), 1),
            "attention_fwdbwd_standalone": round(tflops(attn_fwdbwd, t_attn_step), 1),
        },
        "mfu": {
            "datasheet": round(fl_fwdbwd * ex / t_full / 1e12 / peak, 4),
            "sustained_ceiling_util": round(fl_fwdbwd * ex / t_full / 1e12 / SUSTAINED_TFLOPS, 4),
        },
        "hbm_stream_gbps": round(gbps, 1),
        "ideal_time_at_sustained_s": round(fl_fwdbwd * ex / (SUSTAINED_TFLOPS * 1e12), 4),
    }
    report["residual_s"] = round(t_full - report["ideal_time_at_sustained_s"], 4)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
