"""List / delete cached StepFailure records in a sweep workspace.

Transient backend faults used to be cached exactly like workload failures,
permanently marking feasible arms "failed". New code never caches
``InfrastructureError`` (``experiments/cache.py``); this tool cleans up
records that predate that fix, or any failure class the operator wants
re-run.

    python scripts/purge_step_failures.py --workspace .cache/workspace
    python scripts/purge_step_failures.py --match UNAVAILABLE --delete
"""

import argparse
import os
import re
import sys

sys.path.insert(0, ".")

import dill

from multimodal_llm_pretraining_tpu.experiments.cache import StepFailure


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workspace", default=os.environ.get("MLPT_WORKSPACE_DIR"), help="workspace dir (default: $MLPT_WORKSPACE_DIR)")
    p.add_argument("--match", default="", help="regex over 'error_type: message' (default: every StepFailure)")
    p.add_argument("--delete", action="store_true", help="delete matches (default: list only)")
    args = p.parse_args()
    if not args.workspace or not os.path.isdir(args.workspace):
        p.error(f"no workspace directory: {args.workspace!r}")

    pattern = re.compile(args.match) if args.match else None
    n_matched = 0
    for fname in sorted(os.listdir(args.workspace)):
        if not fname.endswith(".dill"):
            continue
        path = os.path.join(args.workspace, fname)
        try:
            with open(path, "rb") as f:
                value = dill.load(f)
        except Exception as e:  # truncated/foreign file: report, never delete
            print(f"unreadable: {fname} ({type(e).__name__}: {e})")
            continue
        if not isinstance(value, StepFailure):
            continue
        desc = f"{value.error_type}: {value.message}"
        if pattern is not None and not pattern.search(desc):
            continue
        n_matched += 1
        action = "deleted" if args.delete else "found"
        print(f"{action}: {fname[:-5]} -- {desc[:160]}")
        if args.delete:
            os.remove(path)
    print(f"{n_matched} cached failure(s) {'deleted' if args.delete else 'matched'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
