#!/bin/bash
# Sequential TPU parity queue. Usage:
#   run_queue.sh [wait_pid]
# Waits for an optional running job (pid) to exit, then runs each recipe in
# order on the TPU. Each run checkpoints + resumes, so re-launching this
# script after a stall is safe.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=axon

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[queue] waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[queue] pid $WAIT_PID done; starting queue"
fi

run() {  # recipe in_path extra...
  local recipe="$1"; shift
  local in_path="$1"; shift
  if [ -f "experiments/results/${recipe}.json" ]; then
    echo "[queue] $recipe already has a result, skipping"
    return
  fi
  echo "[queue] ===== $recipe ====="
  timeout 7200 python experiments/kge_parity.py --recipe "$recipe" \
    --in_path "$in_path" --ckpt_every 250 "$@" \
    >> "/tmp/queue_${recipe}.log" 2>&1
  echo "[queue] $recipe rc=$?"
}

WN=/root/reference/OpenKE/benchmarks/WN18RR/
FB=/root/reference/OpenKE/benchmarks/FB15K237/

run distmult_WN18RR "$WN" --train_times 3500
run complex_WN18RR "$WN" --train_times 3000
run transe_WN18RR "$WN"
run transh_WN18RR "$WN"
run transd_WN18RR "$WN"
run transr_FB15K237 "$FB"
run distmult_FB15K237 "$FB"
run complex_FB15K237 "$FB"
echo "[queue] all done"
