#!/bin/bash
# Backend-outage watchdog (round 4): while the axon backend is UNAVAILABLE,
# the queue is parked in experiments/queue/hold/ so jobs don't burn their 8
# retries against a dead tunnel. This loop waits until no supervisor job is
# live, probes the backend with a tiny 1+1 (single client, short timeout),
# and restores the queue once the probe succeeds.
set -u
cd "$(dirname "$0")/.."
Q=experiments/queue
DEADLINE=${DEADLINE:-$(( $(date +%s) + 8 * 3600 ))}

log() { echo "[watchdog $(date +%H:%M:%S)] $*"; }

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  pid=$(cat /tmp/q_current.pid 2>/dev/null || true)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    log "supervisor job (pid $pid) still live; waiting"
    sleep 120
    continue
  fi
  log "probing axon backend..."
  if timeout 240 env PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python -c "import jax; print('probe ok:', jax.numpy.add(1,1))" \
      >> /tmp/watchdog_probe.log 2>&1; then
    log "backend healthy; restoring queue"
    mv "$Q"/hold/*.job "$Q"/ 2>/dev/null
    log "restored: $(ls "$Q"/*.job 2>/dev/null | wc -l) jobs"
    exit 0
  fi
  log "probe failed; backend still down"
  sleep 420
done
log "deadline reached without recovery"
