#!/bin/bash
# Backend-outage watchdog (round 5): while the axon backend is UNAVAILABLE,
# the queue is parked in experiments/queue/hold/ so jobs don't burn their 8
# retries against a dead tunnel (the supervisor parks it on stall+probe-fail).
# This loop runs PERSISTENTLY: whenever hold/ has jobs and no supervisor job
# is live, it probes the backend with a tiny 1+1 (single client, short
# timeout) and restores the queue on success — then keeps watching, so a
# re-outage mid-drain gets re-restored too. DEADLINE is a hard stop only.
set -u
cd "$(dirname "$0")/.."
Q=experiments/queue
DEADLINE=${DEADLINE:-$(( $(date +%s) + 48 * 3600 ))}

log() { echo "[watchdog $(date +%H:%M:%S)] $*"; }

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if ! ls "$Q"/hold/*.job >/dev/null 2>&1; then
    sleep 300   # nothing parked; queue (if any) is draining normally
    continue
  fi
  pid=$(cat /tmp/q_current.pid 2>/dev/null || true)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    log "supervisor job (pid $pid) still live; waiting"
    sleep 120
    continue
  fi
  log "probing axon backend..."
  # flock serializes against every other axon client (supervisor probe,
  # queue jobs, bench.py) — two concurrent axon clients wedge the tunnel.
  # -w 5: if another client holds the lock the tunnel is in LEGITIMATE use;
  # skip this probe cycle rather than queueing a second client behind it.
  if ! flock -w 5 /tmp/axon_client.lock true; then
    log "client lock busy (another axon client live); skipping probe"
    sleep 120
    continue
  fi
  if flock -w 60 /tmp/axon_client.lock \
      timeout 240 env PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python -c "import jax; print('probe ok:', jax.numpy.add(1,1))" \
      >> /tmp/watchdog_probe.log 2>&1; then
    log "backend healthy; restoring queue"
    mv "$Q"/hold/*.job "$Q"/ 2>/dev/null
    log "restored: $(ls "$Q"/*.job 2>/dev/null | wc -l) jobs"
    continue
  fi
  log "probe failed; backend still down"
  sleep 420
done
log "deadline reached; watchdog exiting"
