#!/bin/bash
# Serial TPU job supervisor with stall recovery.
#
# The axon TPU tunnel occasionally wedges (device ops hang forever; the
# client process sits idle and its log stops advancing). Every job here
# checkpoints and resumes (kge_parity.py --ckpt_every) or is idempotent
# (microbenches), so the recovery is always: kill the wedged client, wait
# for the tunnel to recover, relaunch the same command.
#
# Usage:  tpu_supervisor.sh [adopt_pid adopt_log]
#   adopt_pid/adopt_log: an already-running first job to babysit before
#   starting the queue (it is killed if its log goes stale, and the queue's
#   own copy of that job then resumes it from its checkpoint).
#
# Job list: RotatE WN18RR +adv parity, the three TPU microbenches
# (bench.py factored path, pallas attention, bf16 fusion step), then the
# KGE parity recipes in VERDICT-priority order.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=axon

STALL_S=900          # log silent this long while the pid lives == wedged
RECOVER_S=120        # tunnel recovery pause after killing a wedged client

log() { echo "[supervisor $(date +%H:%M:%S)] $*"; }

fresh() {  # fresh <file> — mtime younger than STALL_S?
  [ -f "$1" ] && [ $(( $(date +%s) - $(stat -c %Y "$1") )) -lt "$STALL_S" ]
}

babysit() {  # babysit <pid> <logfile> — wait for exit; kill if log stalls
  local pid="$1" logf="$2"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    if ! fresh "$logf" && kill -0 "$pid" 2>/dev/null; then
      log "stall: $logf silent >${STALL_S}s, killing $pid"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      sleep "$RECOVER_S"
      return 1
    fi
  done
  return 0
}

run_until_done() {  # run_until_done <result_file> <logfile> <cmd...>
  local result="$1" logf="$2"; shift 2
  local tries=0
  while [ ! -f "$result" ] && [ "$tries" -lt 8 ]; do
    tries=$((tries + 1))
    log "launch (try $tries): $*"
    "$@" >> "$logf" 2>&1 &
    local pid=$!
    babysit "$pid" "$logf" || continue
    wait "$pid" 2>/dev/null
  done
  [ -f "$result" ] && log "done: $result" || log "GAVE UP: $result"
}

R=experiments/results
mkdir -p "$R"

# Phase 0: adopt an externally-launched first job, if any.
if [ -n "${1:-}" ]; then
  log "adopting pid $1 (log ${2:-?})"
  babysit "$1" "${2:-/dev/null}" || log "adopted job stalled and was killed"
fi

WN=/root/reference/OpenKE/benchmarks/WN18RR/
FB=/root/reference/OpenKE/benchmarks/FB15K237/

run_until_done "$R/rotate_WN18RR_adv.json" /tmp/rotate_adv.log \
  python experiments/kge_parity.py --recipe rotate_WN18RR_adv \
  --in_path "$WN" --ckpt_every 500 --log_every 25

if [ ! -f "$R/bench_factored_tpu.json" ]; then
  timeout 1800 python bench.py > /tmp/bench_factored.log 2>&1 \
    && tail -1 /tmp/bench_factored.log > "$R/bench_factored_tpu.json"
  log "bench.py rc=$?"
fi
if [ ! -f "$R/pallas_attn_bench.json" ]; then
  timeout 2400 python experiments/pallas_attn_bench.py > /tmp/pallas_attn.log 2>&1 \
    && tail -1 /tmp/pallas_attn.log > "$R/pallas_attn_bench.json"
  log "attn bench rc=$?"
fi
if [ ! -f "$R/bf16_step_bench.json" ]; then
  timeout 3600 python experiments/bf16_step_bench.py > /tmp/bf16_step.log 2>&1 \
    && tail -1 /tmp/bf16_step.log > "$R/bf16_step_bench.json"
  log "bf16 bench rc=$?"
fi

recipe() {  # recipe <name> <in_path> [extra...]
  local name="$1" in_path="$2"; shift 2
  run_until_done "$R/${name}.json" "/tmp/queue_${name}.log" \
    timeout 10800 python experiments/kge_parity.py --recipe "$name" \
    --in_path "$in_path" --ckpt_every 250 "$@"
}

recipe distmult_WN18RR "$WN" --train_times 3500
recipe complex_WN18RR "$WN" --train_times 3000
recipe transr_FB15K237 "$FB"
recipe transe_WN18RR "$WN"
recipe transh_WN18RR "$WN"
recipe transd_WN18RR "$WN"
recipe distmult_FB15K237 "$FB"
recipe complex_FB15K237 "$FB"
log "all done"
