#!/bin/bash
# Chain CPU accuracy lanes on the single host core during the axon outage.
# Waits for the running distmult_WN18RR_adv CPU lane (pid file
# /tmp/cpu_lane.pid or arg $1) to exit, then launches the complex-advstyle
# lane (the job-64 hypothesis: ComplEx through the distmult adv recipe
# shape — dim 1024, sigmoid adv 0.5, adam 0.002, 400 ep). Accuracy-only:
# results carry platform=cpu and tag so they never masquerade as TPU rows.
set -u
cd /root/repo
PREV_PID="${1:-$(cat /tmp/cpu_lane.pid 2>/dev/null || echo '')}"
LOG=/tmp/cpu_lane_cx_adv.log

if [ -n "$PREV_PID" ]; then
  echo "[chain $(date -u +%H:%M:%S)] waiting for pid $PREV_PID (distmult lane)"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
  echo "[chain $(date -u +%H:%M:%S)] distmult lane exited"
fi

if [ -f experiments/results/distmult_WN18RR_adv_cpu.json ]; then
  echo "[chain] distmult_WN18RR_adv_cpu.json present:"
  python - <<'EOF'
import json
r = json.load(open("experiments/results/distmult_WN18RR_adv_cpu.json"))
print({k: r.get(k) for k in ("filter", "best_filter", "vs_published",
                             "best_vs_published", "valid_selection")})
EOF
else
  echo "[chain] WARNING: distmult lane result json missing (crash? harvest via --eval_only)"
fi

echo "[chain $(date -u +%H:%M:%S)] launching complex advstyle CPU lane -> $LOG"
JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
  nice -n 19 python experiments/kge_parity.py \
  --recipe distmult_WN18RR_adv \
  --in_path /root/reference/OpenKE/benchmarks/WN18RR/ \
  --tag cpu_complexadv --override model=complex \
  --ckpt_every 25 --valid_every 50 > "$LOG" 2>&1 &
echo $! > /tmp/cpu_lane_cx.pid
echo "[chain] complex lane pid $(cat /tmp/cpu_lane_cx.pid)"
wait
echo "[chain $(date -u +%H:%M:%S)] complex lane exited rc=$?"
