#!/bin/bash
# Round-5 grid chain: complete --methods all searches for every family the
# round-4 chain lost to infrastructure (roberta, vit, convnext x3,
# vilt-original-pretrain), resolve llava-finetune's unresolved arms, and add
# the pythia-2.8b grid. One family at a time (the chip serializes anyway);
# each family gets a naive stage + an all stage, two attempts each (the
# workspace cache makes attempt 2 run only the arms attempt 1 lost), with a
# TPU-health poll between attempts.
#
#   nohup bash scripts/chain_r5.sh > logs/chain_r5a.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export MLPT_WORKSPACE_DIR="$PWD/.cache/workspace"

tpu_healthy() {
  # devices() can enumerate while EXECUTION hangs (observed 2026-08-19:
  # trivial matmuls time out at 3 min while jax.devices() answers in 5 s),
  # so health requires an actual program to run end to end.
  timeout 120 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8, 128)).sum()) == 8 * 128
" >/dev/null 2>&1
}

wait_for_tpu() {
  until tpu_healthy; do
    echo "[$(date +%H:%M:%S)] TPU tunnel unhealthy; sleeping 180s"
    sleep 180
  done
}

run_stage() {
  local model=$1 methods=$2 tmo=$3
  local attempt rc
  for attempt in 1 2; do
    echo "=== [$(date +%H:%M:%S)] $model methods=$methods attempt=$attempt tmo=$tmo ==="
    timeout "$tmo" python scripts/benchmark.py --num-hosts 1 --chips-per-host 1 \
      --tpu-type v5e --model "$model" --methods "$methods" --cmd run
    rc=$?
    echo "=== [$(date +%H:%M:%S)] $model $methods attempt=$attempt rc=$rc ==="
    # count unfinished arms; a clean pass with no unresolved work exits the loop
    local left
    left=$(python - "$model" <<'EOF'
import sys
sys.path.insert(0, ".")
from scripts.plotting import unresolved_arms
print(len(unresolved_arms(1, 1, "v5e", sys.argv[1])))
EOF
)
    echo "=== [$(date +%H:%M:%S)] $model unresolved=$left ==="
    [ "$left" = "0" ] && return 0
    wait_for_tpu
  done
  return 1
}

# Order front-loads the round-4 verdict's top_next (llava-finetune's
# unresolved fitting arm) and the families that were never attempted, so a
# tunnel outage truncates the LOWEST-priority tail. Timeouts trimmed to keep
# the chain visiting every family inside one round; attempt-2 + the step
# cache make partial stages resumable.
for spec in \
  "roberta 10800" \
  "llava-finetune 5400" \
  "vilt-original-pretrain 5400" \
  "vit 9000" \
  "convnext-large-1k 7200" \
  "convnext-large-22k 7200" \
  "convnext-xlarge-22k 7200" \
  "pythia-2.8b 10800" \
  ; do
  set -- $spec
  model=$1; tmo=$2
  wait_for_tpu
  run_stage "$model" naive 2700
  run_stage "$model" all "$tmo"
done

echo "=== [$(date +%H:%M:%S)] chain complete ==="
