"""Reproduce/verify the llava-finetune ckpt+zero_3+offload confirm probe.

Round-4 verdict item 2: this arm FITS at mbs=1 (14.77 GiB < 15.04 budget,
logs/chain_r4c.log 07:21:52) but its confirm probe died 5x -- among the
faults the axon AOT compiler's "Unimplemented DMA from hbm to hbm" seen when
streamed-init-produced host arrays feed the grouped update programs
(CLAUDE.md round-2 findings). Runs the exact probe-worker op the sweep runs,
in-process logging included, so the fault (if it recurs) is captured
verbatim.

Usage: python scripts/probe_llava_dma.py [--op confirm] [--mbs 1]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="confirm", choices=["confirm", "confirm_fused", "time_phases"])
    ap.add_argument("--mbs", type=int, default=1)
    ap.add_argument("--model", default="llava-finetune")
    ap.add_argument("--sharding", default="zero_3")
    ap.add_argument("--ckpt", action="store_true", default=True)
    args = ap.parse_args()

    from multimodal_llm_pretraining_tpu.benchmarking.isolation import _run_tracked, _worker_env

    spec = {
        "op": args.op,
        "config": {
            "num_hosts": 1,
            "chips_per_host": 1,
            "tpu_type": "v5e",
            "model": args.model,
            "free_lunch": True,
            "activation_checkpointing": args.ckpt,
            "checkpoint_policy": "flash",
            "sharding": args.sharding,
            "offloading": True,
        },
        "micro_batch_size": args.mbs,
    }
    if args.op == "time_phases":
        spec["samples"] = 3
    proc = _run_tracked(
        [sys.executable, "-m", "multimodal_llm_pretraining_tpu.benchmarking.probe_worker"],
        input=json.dumps(spec),
        timeout=3600,
        env=_worker_env(None),
        cwd=".",
    )
    print(f"returncode={proc.returncode}")
    print("--- stdout ---")
    print(proc.stdout[-8000:])
    print("--- stderr ---")
    print(proc.stderr[-8000:])


if __name__ == "__main__":
    main()
