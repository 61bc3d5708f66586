"""Headline benchmark: pythia tokens/sec/chip with the free-lunch method.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares achieved model-FLOPs utilization against the north-star
45% MFU target (BASELINE.md): vs_baseline = MFU / 0.45. MFU uses XLA
cost-analysis FLOPs for the fwd+bwd step against the chip's peak bf16 FLOPS
from the registry (the reference's analytic peak-TFLOPS table analog,
``experiments/training_time_analytic.py:24-47``).
"""

import json
import time

import jax


def main():
    from multimodal_llm_pretraining_tpu.models import get_model_class
    from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
    from multimodal_llm_pretraining_tpu.tpus import detect_local_tpu, peak_tflops
    from multimodal_llm_pretraining_tpu.train import TrainingPlan

    model_type = "pythia-410m"
    mc = get_model_class(model_type)
    n_chips = len(jax.devices())

    micro_batch_size = 16
    plan = TrainingPlan(
        num_training_steps=8,
        micro_batch_size=micro_batch_size,
        gradient_accumulation_steps=1,
        activation_checkpointing=True,
        bf16=True,
        compile=True,
        use_custom_kernels=True,
        matmul_precision="default",
        optimizer=mc.optimizer,
        optimizer_kwargs=mc.optimizer_kwargs,
        scheduler_type=mc.scheduler_type,
        scheduler_kwargs=mc.scheduler_kwargs,
        sharding="" if n_chips == 1 else "zero_1",
        max_grad_norm=mc.max_grad_norm,
        mesh=MeshConfig(num_hosts=1, chips_per_host=n_chips),
    )
    sess = plan.build_session(mc)
    state = sess.init_state()
    step = sess.train_step_fn()

    from multimodal_llm_pretraining_tpu.utils import block_on

    # warmup (compile + settle)
    for i in range(2):
        state, metrics = step(state, sess.make_train_batch(seed=i), jax.random.key(0))
        block_on(metrics)

    times = []
    for i in range(2, 7):
        batch = sess.make_train_batch(seed=i)
        block_on(batch)
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.key(0))
        block_on((state.params, metrics))
        times.append(time.perf_counter() - t0)

    step_time = sorted(times)[len(times) // 2]  # median
    tokens_per_step = micro_batch_size * n_chips * mc.sequence_length
    tokens_per_sec_per_chip = tokens_per_step / step_time / n_chips

    # MFU from the analytic dense-transformer FLOPs count (XLA cost_analysis
    # under-reports through Pallas kernels and some PJRT transports)
    from multimodal_llm_pretraining_tpu.benchmarking.flops import analytic_flops_per_example

    # standard MFU: useful fwd+bwd FLOPs only (remat recompute is overhead,
    # not model work)
    flops_per_example = analytic_flops_per_example(mc, backward=True, remat=False)
    mfu = None
    tpu_type = detect_local_tpu()
    if flops_per_example and tpu_type:
        achieved_tflops = flops_per_example * micro_batch_size / step_time / 1e12
        mfu = achieved_tflops / peak_tflops(tpu_type, "bf16")

    vs_baseline = (mfu / 0.45) if mfu else None
    print(
        json.dumps(
            {
                "metric": f"{model_type} tokens/sec/chip (free-lunch bf16, flash-attn, fused step)",
                "value": round(tokens_per_sec_per_chip, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(vs_baseline, 4) if vs_baseline else None,
                "detail": {
                    "step_time_s": round(step_time, 4),
                    "mfu": round(mfu, 4) if mfu else None,
                    "tpu": tpu_type,
                    "n_chips": n_chips,
                    "loss": round(float(metrics["loss"]), 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
