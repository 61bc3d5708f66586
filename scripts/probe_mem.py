"""AOT memory analysis for one grads/step program (no execution)."""

import argparse
import sys

sys.path.insert(0, ".")

import jax

from multimodal_llm_pretraining_tpu.models import get_model_class
from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
from multimodal_llm_pretraining_tpu.train import TrainingPlan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="pythia-1b")
    ap.add_argument("--mbs", type=int, default=4)
    ap.add_argument("--acc", type=int, default=2)
    ap.add_argument("--sharding", default="zero_2")
    ap.add_argument("--offloading", action="store_true", default=True)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--ckpt-policy", default="flash", choices=["flash", "dots"])
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
        max_grad_norm=mc.max_grad_norm,
        mesh=MeshConfig(num_hosts=1, chips_per_host=1),
    )
    sess = plan.build_session(mc)

    def show(tag, lowered):
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        if ma is None:
            print(f"{tag}: no memory analysis")
            return
        gib = 2**30
        print(
            f"{tag}: args {ma.argument_size_in_bytes/gib:.2f}  out {ma.output_size_in_bytes/gib:.2f}  "
            f"temp {ma.temp_size_in_bytes/gib:.2f}  alias {ma.alias_size_in_bytes/gib:.2f}  "
            f"total {(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes)/gib:.2f} GiB",
            flush=True,
        )

    # grads program
    params_s = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh), sess.param_shapes, sess.param_sharding
    )
    batch_s = sess.micro_batch_specs(leading_acc_dim=True)
    rng_s = jax.ShapeDtypeStruct((), jax.random.key(0).dtype, sharding=sess.repl_sharding)
    step_s = jax.ShapeDtypeStruct((), jax.numpy.int32, sharding=sess.repl_sharding)
    grads_s = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh), sess.grad_shapes, sess.grad_sharding
    )
    gfn = sess.grads_fn()
    show("grads", gfn.lower(params_s, grads_s, batch_s, rng_s, step_s))

    # init programs
    show("init_params", jax.jit(sess.bundle.init_fn, out_shardings=sess.param_sharding).lower(rng_s))
    show("init_opt", jax.jit(sess.tx.init, out_shardings=sess.opt_sharding).lower(params_s))

    # fused streamed update
    if sess.streaming_offload:
        opt_s = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            jax.eval_shape(sess.tx.init, params_s),
            sess.opt_sharding,
        )
        upd = sess.optimizer_update_fn()
        show("fused_update", upd.lower(params_s, opt_s, grads_s, float(args.acc)))


if __name__ == "__main__":
    main()
