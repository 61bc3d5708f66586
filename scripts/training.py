"""Real training entry point (parity: ``/root/reference/scripts/training.py``).

Rebuilds a TrainingPlan from an exported TrainingArguments JSON
(``scripts/to_training_arguments.py``), selects the dataset/collator for the
model type, and runs the trainer loop with orbax checkpointing.

Multi-host: run the identical command on every TPU host with
MLPT_COORDINATOR_ADDRESS / MLPT_NUM_PROCESSES / MLPT_PROCESS_INDEX set
(``experiments/distribute.py``); jax.distributed wires the mesh.

    python scripts/training.py --training-arguments-file args.json \
        --output-dir ckpts/pythia-160m [--dataset dummy|real] [--max-steps N]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from multimodal_llm_pretraining_tpu.experiments.distribute import maybe_init_distributed
from multimodal_llm_pretraining_tpu.models import SchedulerType, get_model_class
from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
from multimodal_llm_pretraining_tpu.train import TrainingPlan
from multimodal_llm_pretraining_tpu.training.trainer import Trainer
from multimodal_llm_pretraining_tpu.utils import get_logger

logger = get_logger()


def plan_from_arguments(args: dict) -> TrainingPlan:
    return TrainingPlan(
        num_training_steps=args["num_training_steps"],
        micro_batch_size=args["micro_batch_size"],
        gradient_accumulation_steps=args["gradient_accumulation_steps"],
        activation_checkpointing=args.get("activation_checkpointing", False),
        bf16=args.get("bf16", False),
        fp16=args.get("fp16", False),
        matmul_precision=args.get("matmul_precision", "highest"),
        compile=args.get("compile", False),
        use_custom_kernels=args.get("use_custom_kernels", True),
        optimizer=args.get("optimizer", "adamw"),
        optimizer_kwargs=args.get("optimizer_kwargs", {}),
        scheduler_type=SchedulerType(args.get("scheduler_type", "linear")),
        scheduler_kwargs=args.get("scheduler_kwargs", {}),
        sharding=args.get("sharding", ""),
        offloading=args.get("offloading", False),
        checkpoint_policy=args.get("checkpoint_policy", "flash"),
        grad_accum_dtype=args.get("grad_accum_dtype"),
        opt_state_dtype=args.get("opt_state_dtype"),
        master_weights=args.get("master_weights", False),
        unroll_layers=args.get("unroll_layers", False),
        max_grad_norm=args.get("max_grad_norm", 0.0),
        mesh=MeshConfig(
            num_hosts=args.get("num_hosts", 1),
            chips_per_host=args.get("chips_per_host", 1),
            tensor_parallel=args.get("tensor_parallel", 1),
        ),
    )


def get_dataset_and_collator(model_type: str, which: str, data_dir: str | None):
    """Dataset dispatch (reference ``scripts/training.py:19-56``): LLaVA and
    ViLT models train on their real corpora when --dataset real."""
    if which == "dummy":
        return None, None
    from multimodal_llm_pretraining_tpu.data import get_real_dataset

    return get_real_dataset(model_type, data_dir)


def main():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--training-arguments-file", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--dataset", choices=["dummy", "real"], default="dummy")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--save-steps", type=int, default=1000)
    p.add_argument("--log-steps", type=int, default=10)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--profile-dir", default=None, help="write a jax.profiler trace of steps 2-4")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--init-params-from",
        default=None,
        help="orbax checkpoint dir of a finished phase to chain from "
        "(llava-finetune <- llava-pretrain; fresh optimizer/step)",
    )
    a = p.parse_args()

    maybe_init_distributed()

    with open(a.training_arguments_file) as f:
        args = json.load(f)

    model_class = get_model_class(args["model"])
    plan = plan_from_arguments(args)
    session = plan.build_session(model_class)
    dataset, collator = get_dataset_and_collator(args["model"], a.dataset, a.data_dir)

    trainer = Trainer(
        session,
        output_dir=a.output_dir,
        save_steps=a.save_steps,
        log_steps=a.log_steps,
        dataset=dataset,
        collate_fn=collator,
        resume=not a.no_resume,
        seed=a.seed,
        profile_dir=a.profile_dir,
        init_params_from=a.init_params_from,
    )
    final = trainer.train(max_steps=a.max_steps)
    logger.info(f"training finished: {final}")


if __name__ == "__main__":
    main()
