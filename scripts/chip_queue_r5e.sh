#!/bin/bash
# Round-5 chip queue E: staging-variant probe (queue D showed 16 MB slab
# device_puts LOSE to one bulk upload over the tunnel at L=1024), then
# re-measure the L=1024 e2e cell with whatever stage_conditioning does
# at that point. Waits for queue D; one chip.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_queue_r5e.log}
QDLOG=${2:-/tmp/chip_queue_r5d.log}

echo "waiting for queue D ($QDLOG)" >>"$LOG"
for i in $(seq 1 360); do
  grep -q "QUEUE D DONE" "$QDLOG" 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE D DONE" "$QDLOG" || echo "queue D never finished; proceeding" >>"$LOG"

probe() {
  for i in $(seq 1 60); do
    if timeout 180 python -c "
import jax, numpy as np, jax.numpy as jnp
np.asarray(jnp.ones((8,8)) @ jnp.ones((8,8)))
print('probe ok')" >>"$LOG" 2>&1; then
      return 0
    fi
    echo "probe $i failed; sleeping 120s" >>"$LOG"
    sleep 120
  done
  return 1
}

run() {
  echo "=== $(date -u +%H:%M:%S) $*" >>"$LOG"
  probe || { echo "CHIP UNAVAILABLE, aborting" >>"$LOG"; exit 1; }
  timeout 7200 "$@" >>"$LOG" 2>&1
  echo "--- exit=$? $(date -u +%H:%M:%S)" >>"$LOG"
}

run python scripts/probe_staging_r5.py 1024
echo "QUEUE E PROBE DONE" >>"$LOG"
