"""CLI contract tests (subprocess; CPU backend)."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # subprocess-spawning; run with -m slow

ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": os.getcwd()}


def run(args, **kw):
    return subprocess.run([sys.executable, *args], capture_output=True, text=True, env=ENV, **kw)


def test_to_training_arguments_roundtrip(tmp_path):
    out = tmp_path / "args.json"
    r = run(
        [
            "scripts/to_training_arguments.py",
            "--num-hosts", "1", "--chips-per-host", "4", "--tpu-type", "v5e",
            "--model", "pythia-160m", "--free-lunch", "--sharding", "zero_2",
            "--micro-batch-size", "16", "--gradient-accumulation-steps", "16",
            "--output-file", str(out),
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    args = json.loads(out.read_text())
    assert args["model"] == "pythia-160m"
    assert args["sharding"] == "zero_2"
    assert args["micro_batch_size"] == 16
    assert args["gradient_accumulation_steps"] == 16
    # free lunch on TPU: high matmul precision + compile cache + kernels
    assert args["matmul_precision"] == "high"
    assert args["compile"] is True and args["use_custom_kernels"] is True
    # pythia declares fp16 -> runs as bf16-on-TPU but keeps the flag
    assert args["fp16"] is True and args["bf16"] is False
    assert args["optimizer"] == "adam"
    assert args["scheduler_type"] == "cosine_with_min_lr"
    # 4 chips x 16 mbs x 16 acc == model batch 1024
    assert 4 * 16 * 16 == 1024


def test_benchmark_count_command():
    r = run(
        [
            "scripts/benchmark.py",
            "--num-hosts", "1", "--chips-per-host", "8", "--tpu-type", "v4",
            "--model", "pythia-160m", "--methods", "all", "--cmd", "count",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # (no-ckpt + ckpt[flash] + ckpt[dots]) x (1 unsharded + 5 sharded x
    # 2 offload) = 33 valid experiments (the dots remat flavor only exists
    # under activation checkpointing)
    assert "/ 33 experiments" in r.stdout


def test_benchmark_validates_divisibility():
    r = run(
        [
            "scripts/benchmark.py",
            "--num-hosts", "1", "--chips-per-host", "3", "--tpu-type", "v4",
            "--model", "pythia-160m", "--methods", "naive", "--cmd", "count",
        ]
    )
    assert r.returncode != 0
    assert "divisible" in (r.stderr + r.stdout)


def test_run_sweep_count(tmp_path):
    space = tmp_path / "space.json"
    space.write_text(
        json.dumps(
            dict(
                num_hosts=[1], chips_per_host=[8], tpu_type=["v4"],
                model=["pythia-160m"], free_lunch=[True],
                activation_checkpointing=[False], sharding=["", "zero_1"], offloading=[False],
            )
        )
    )
    r = run(["scripts/run_sweep.py", "--sweep", "training_time_empirical", "--search-space", str(space), "--cmd", "count"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "/ 2 experiments" in r.stdout
