"""Training-method search CLI (parity: ``/root/reference/scripts/benchmark.py``).

Enumerates the efficient-training-method grid for one (topology, TPU type,
model), runs the empirical timing experiment for every valid combination,
and caches results in the workspace.

    python scripts/benchmark.py --num-hosts 1 --chips-per-host 1 \
        --tpu-type v5e --model pythia-160m --methods naive

methods: naive      -> fp32-precision matmuls, no custom kernels
         free-lunch -> high matmul precision + Pallas kernels + compile cache
         all        -> free-lunch x {remat} x {sharding methods} x {offload}
"""

import argparse
import math
import signal
import sys

sys.path.insert(0, ".")

from multimodal_llm_pretraining_tpu.experiments.base_classes import Sweep
from multimodal_llm_pretraining_tpu.experiments.sweeps import TrainingTimeEmpiricalSweep
from multimodal_llm_pretraining_tpu.models import MODEL_TYPES, get_model_class
from multimodal_llm_pretraining_tpu.tpus import TPU_TYPES, supports_bf16


def validate_arguments(num_hosts: int, chips_per_host: int, tpu_type: str, model: str) -> None:
    model_class = get_model_class(model)  # type: ignore[arg-type]
    num_chips = num_hosts * chips_per_host
    assert model_class.batch_size % num_chips == 0, (
        f"model batch size ({model_class.batch_size}) should be evenly divisible by total chips ({num_chips})"
    )
    assert math.log2(model_class.batch_size // num_chips).is_integer(), (
        f"batch size per chip ({model_class.batch_size // num_chips}) should be power of 2"
    )
    if model_class.mixed_precision == "bf16":
        assert supports_bf16(tpu_type), "TPU must support bf16"  # always true


def run_benchmark(
    num_hosts: int,
    chips_per_host: int,
    tpu_type: str,
    model: str,
    methods: str = "all",
    cmd: str = "run",
    slurm: bool = False,
    tensor_parallel: int = 1,
) -> None:
    validate_arguments(num_hosts, chips_per_host, tpu_type, model)

    # Method grid (reference scripts/benchmark.py:45-63)
    free_lunch = [False]
    activation_checkpointing = [False]
    checkpoint_policy = ["flash"]
    sharding = [""]
    offloading = [False]
    state_layout = [""]
    unroll_layers = [False]

    if methods == "free-lunch":
        free_lunch = [True]
    elif methods == "all":
        free_lunch = [True]
        activation_checkpointing = [False, True]
        # remat flavor is a real TPU search dimension: "dots" trades ~2.5x
        # activation memory for a ~25% faster step (validity rule skips the
        # no-remat duplicates)
        checkpoint_policy = ["flash", "dots"]
        sharding = ["", "zero_1", "zero_2", "zero_3", "fsdp_shard_grad_op", "fsdp_full_shard"]
        offloading = [False, True]
        # bf16 state layouts (on-device alternative to the offloaded
        # optimizer; validity rule restricts them to unoffloaded bf16 arms)
        state_layout = ["", "bf16_master", "bf16_sr"]
        # layer-stack unrolling (scan vs unrolled trunk): validity rule keeps
        # the True arms to scanned-stack models under free lunch
        unroll_layers = [False, True]

    sweep = TrainingTimeEmpiricalSweep(
        search_space=dict(
            num_hosts=[num_hosts],
            chips_per_host=[chips_per_host],
            tpu_type=[tpu_type],
            model=[model],
            free_lunch=free_lunch,
            activation_checkpointing=activation_checkpointing,
            checkpoint_policy=checkpoint_policy,
            sharding=sharding,
            offloading=offloading,
            tensor_parallel=[tensor_parallel],
            state_layout=state_layout,
            unroll_layers=unroll_layers,
        )
    )
    Sweep.run(experiment_sweep=sweep, cmd=cmd, slurm=slurm)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--num-hosts", type=int, required=True)
    p.add_argument("--chips-per-host", type=int, required=True)
    p.add_argument("--tpu-type", choices=TPU_TYPES, required=True)
    p.add_argument("--model", choices=MODEL_TYPES, required=True)
    p.add_argument("--methods", choices=["naive", "free-lunch", "all"], default="all")
    p.add_argument("--cmd", choices=["run", "count", "print-incomplete", "print-results"], default="run")
    p.add_argument("--slurm", action="store_true")
    p.add_argument("--tensor-parallel", type=int, default=1)
    a = p.parse_args()
    run_benchmark(a.num_hosts, a.chips_per_host, a.tpu_type, a.model, a.methods, a.cmd, a.slurm, a.tensor_parallel)


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        sys.exit(128 + signal.SIGINT)
