#!/bin/bash
# Round-5 chip queue H: device-only comparator for the queue-F L=300 e2e
# cell (default solver dpm_2m30, XLA path — the [257,331] zone). Waits for
# queue G.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_queue_r5h.log}
QGLOG=${2:-/tmp/chip_queue_r5g.log}

echo "waiting for queue G ($QGLOG)" >>"$LOG"
for i in $(seq 1 480); do
  grep -q "QUEUE G DONE" "$QGLOG" 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE G DONE" "$QGLOG" || echo "queue G never finished; proceeding" >>"$LOG"

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

run python bench.py --length 300 --batch 8
echo "QUEUE H DONE" >>"$LOG"
