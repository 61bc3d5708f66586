"""Quick step-time probe: grads-only and full-step timings for one config.

Usage:
  python scripts/step_bench.py --model pythia-1b --mbs 4 --acc 4 \
      --sharding cpu_offload --no-remat
Prints per-microbatch fwd+bwd time, full-step time, and MFU (datasheet).
"""

import argparse
import sys

sys.path.insert(0, ".")
import time

import jax

from multimodal_llm_pretraining_tpu.benchmarking.flops import analytic_flops_per_example
from multimodal_llm_pretraining_tpu.models import get_model_class
from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
from multimodal_llm_pretraining_tpu.tpus import detect_local_tpu, peak_tflops
from multimodal_llm_pretraining_tpu.train import TrainingPlan
from multimodal_llm_pretraining_tpu.utils import block_on


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="pythia-1b")
    ap.add_argument("--mbs", type=int, default=4)
    ap.add_argument("--acc", type=int, default=4)
    ap.add_argument("--sharding", default="")
    ap.add_argument("--offloading", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--ckpt-policy", default="flash", choices=["flash", "dots"])
    ap.add_argument("--grad-accum", default=None, choices=["bf16", "f32"])
    ap.add_argument("--opt-state", default=None, choices=["bf16", "f32"], help="stored Adam moment dtype")
    ap.add_argument(
        "--master-weights",
        nargs="?",
        const="device",
        default=False,
        choices=["device", "sr"],
        help="bf16 live params; 'device' = on-device f32 master, 'sr' = masterless stochastic rounding",
    )
    ap.add_argument("--unroll-layers", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--grads-only", action="store_true")
    args = ap.parse_args()

    mc = get_model_class(args.model)
    plan = TrainingPlan(
        num_training_steps=8,
        micro_batch_size=args.mbs,
        gradient_accumulation_steps=args.acc,
        activation_checkpointing=not args.no_remat,
        checkpoint_policy=args.ckpt_policy,
        bf16=True,
        compile=True,
        use_custom_kernels=True,
        matmul_precision="default",
        optimizer=mc.optimizer,
        optimizer_kwargs=mc.optimizer_kwargs,
        scheduler_type=mc.scheduler_type,
        scheduler_kwargs=mc.scheduler_kwargs,
        sharding=args.sharding,
        offloading=args.offloading,
        grad_accum_dtype=args.grad_accum,
        opt_state_dtype=args.opt_state,
        master_weights=args.master_weights,
        unroll_layers=args.unroll_layers,
        max_grad_norm=mc.max_grad_norm,
        mesh=MeshConfig(num_hosts=1, chips_per_host=1),
    )
    sess = plan.build_session(mc)
    state = sess.init_state()

    tpu = detect_local_tpu()
    flops = analytic_flops_per_example(mc, backward=True, remat=False)
    peak = peak_tflops(tpu, "bf16") if tpu else None

    if args.grads_only:
        gfn = sess.grads_fn()
        batch = sess.make_train_batch(seed=0)
        for i in range(2):
            g, loss = gfn(state.params, sess.zero_grads(), batch, jax.random.key(0), state.step)
            block_on(loss)
            del g
        times = []
        for i in range(args.steps):
            t0 = time.perf_counter()
            g, loss = gfn(state.params, sess.zero_grads(), batch, jax.random.key(0), state.step)
            block_on((g, loss))
            times.append(time.perf_counter() - t0)
            del g
        t = sorted(times)[len(times) // 2]
        per_micro = t / args.acc
        toks = args.mbs * mc.sequence_length
        mfu = flops * args.mbs * args.acc / t / 1e12 / peak if peak and flops else None
        print(
            f"grads[{args.model} mbs={args.mbs} acc={args.acc} remat={not args.no_remat} "
            f"shard={args.sharding!r}]: {t:.3f}s/step  {per_micro:.3f}s/micro  "
            f"{toks/per_micro:,.0f} tok/s  mfu={mfu:.3f}" if mfu else f"time {t:.3f}"
        )
        return

    step = sess.train_step_fn()
    for i in range(2):
        state, metrics = step(state, sess.make_train_batch(seed=i), jax.random.key(0))
        block_on(metrics)
    times = []
    for i in range(2, 2 + args.steps):
        batch = sess.make_train_batch(seed=i)
        block_on(batch)
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.key(0))
        block_on((state.params, metrics))
        times.append(time.perf_counter() - t0)
    t = sorted(times)[len(times) // 2]
    toks = args.mbs * args.acc * mc.sequence_length
    mfu = flops * args.mbs * args.acc / t / 1e12 / peak if peak and flops else None
    mfu_s = f"{mfu:.4f}" if mfu else "n/a"
    print(
        f"step[{args.model} mbs={args.mbs} acc={args.acc} remat={not args.no_remat} "
        f"shard={args.sharding!r}]: {t:.3f}s/step  {toks/t:,.0f} tok/s/chip  mfu={mfu_s}  "
        f"loss={float(metrics['loss']):.3f}"
    )


if __name__ == "__main__":
    main()
