#!/bin/bash
# Round-5 chip queue C: post-staging-fix long-L e2e extension (L=1024) and
# a fresh default-headline sanity run. Waits for queue B; one chip.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_queue_r5c.log}
QBLOG=${2:-/tmp/chip_queue_r5b.log}

echo "waiting for queue B ($QBLOG)" >>"$LOG"
for i in $(seq 1 360); do
  grep -q "QUEUE B DONE" "$QBLOG" 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE B DONE" "$QBLOG" || echo "queue B never finished; proceeding" >>"$LOG"

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

run python bench.py --e2e --length 1024 --batch 2 --samples 60 --fused --iters 2
run python bench.py
echo "QUEUE C DONE" >>"$LOG"
