"""Fan a training/benchmark command out to a list of TPU hosts in-band.

The torchrunx-CLI analog for clusters without a scheduler: spawns one
coordinated process per host (ssh; ``localhost`` runs locally), wires the
MLPT_* jax.distributed env, streams prefixed logs, and fails fast.

    python scripts/launch.py --hosts tpu-host-0,tpu-host-1 -- \
        python scripts/training.py --model pythia-1b ...

On managed clusters prefer the native fan-out instead (SLURM: the sbatch
files from experiments/slurm.py; GCP: gcloud ... ssh --worker=all).
"""

import argparse
import sys

sys.path.insert(0, ".")

from multimodal_llm_pretraining_tpu.experiments.launcher import LaunchError, Launcher


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--hosts", required=True, help="comma-separated host list; hosts[0] is the coordinator")
    ap.add_argument("--port", type=int, default=9917, help="jax.distributed coordinator port")
    ap.add_argument("--timeout", type=float, default=None, help="overall wall-clock limit in seconds")
    ap.add_argument("--quiet", action="store_true", help="do not stream worker logs")
    ap.add_argument("command", nargs=argparse.REMAINDER, help="command to run on every host (prefix with --)")
    args = ap.parse_args()

    argv = args.command[1:] if args.command[:1] == ["--"] else args.command
    if not argv:
        ap.error("no command given; usage: launch.py --hosts a,b -- python scripts/training.py ...")
    launcher = Launcher(hosts=args.hosts.split(","), coordinator_port=args.port, stream=not args.quiet)
    try:
        launcher.run(argv, timeout_s=args.timeout)
    except (LaunchError, TimeoutError) as e:
        print(f"launch failed: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
