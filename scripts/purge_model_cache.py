"""Purge cached TrainingTimeEmpirical step results for given models.

Step-cache keys hash (config, version), not code: when a model's compiled
program changes (new kernel path, storage layout), previously measured arms
keep serving stale numbers from the workspace. Version bumps invalidate
EVERY model; this purges surgically -- it rebuilds the full method-grid
sweep for each named model, computes every step uid the grid could read
(exactly how ``Sweep.results`` would), and deletes those cache files.

    MLPT_WORKSPACE_DIR=.cache/workspace \
      python scripts/purge_model_cache.py --models vit roberta --delete
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def step_uids(model: str, tpu_type: str, num_hosts: int, chips_per_host: int) -> set[str]:
    from multimodal_llm_pretraining_tpu.experiments.sweeps import TrainingTimeEmpiricalSweep

    sweep = TrainingTimeEmpiricalSweep(
        search_space=dict(
            num_hosts=[num_hosts],
            chips_per_host=[chips_per_host],
            tpu_type=[tpu_type],
            model=[model],
            free_lunch=[False, True],
            activation_checkpointing=[False, True],
            checkpoint_policy=["flash", "dots"],
            sharding=["", "zero_1", "zero_2", "zero_3", "fsdp_shard_grad_op", "fsdp_full_shard"],
            offloading=[False, True],
            state_layout=["", "bf16_master", "bf16_sr"],
            unroll_layers=[False, True],
        )
    )
    uids: set[str] = set()
    for exp in sweep.experiments():
        for call in exp.step_dict.values():
            uids.add(call.unique_id())
    return uids


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--models", nargs="+", required=True)
    p.add_argument("--tpu-type", default="v5e")
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--chips-per-host", type=int, default=1)
    p.add_argument("--delete", action="store_true", help="actually delete (default: dry-run listing)")
    a = p.parse_args()

    root = os.environ.get("MLPT_WORKSPACE_DIR")
    if not root:
        print("MLPT_WORKSPACE_DIR not set", file=sys.stderr)
        return 2
    uids: set[str] = set()
    for model in a.models:
        uids |= step_uids(model, a.tpu_type, a.num_hosts, a.chips_per_host)
    hit = 0
    for uid in sorted(uids):
        path = os.path.join(root, uid + ".dill")
        if os.path.exists(path):
            hit += 1
            print(("deleting " if a.delete else "would delete ") + uid)
            if a.delete:
                os.remove(path)
    print(f"{hit} cached step(s) {'deleted' if a.delete else 'matched (dry run)'} of {len(uids)} possible uids")
    return 0


if __name__ == "__main__":
    sys.exit(main())
