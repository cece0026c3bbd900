#!/bin/bash
# Round-5 chip queue I: the final outstanding cells, combined (queues
# F/G/H were committed but the box recycled before they ran — no /tmp
# logs survived). No sentinel waits; ordered by value-per-minute:
#   1. L=100 e2e sanity under the FINAL staging spelling (the published
#      97.0% cell must not regress after the slab->bulk revert),
#   2. L=300/B=8 e2e — the reference publishes L=300 (1000 samples /
#      40 min on A100, bioemu/README.md:57),
#   3. L=300/B=8 device-only comparator (XLA path, [257,331] zone),
#   4. L=1024/B=2 fused e2e (longest; last so earlier cells land even
#      if the round ends mid-run).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_queue_r5i.log}

probe() {
  for i in $(seq 1 40); do
    if timeout 240 python -c "
import jax, numpy as np, jax.numpy as jnp
np.asarray(jnp.ones((8,8)) @ jnp.ones((8,8)))
print('probe ok')" >>"$LOG" 2>&1; then
      return 0
    fi
    echo "probe $i failed; sleeping 60s" >>"$LOG"
    sleep 60
  done
  return 1
}

run() {
  echo "=== $(date -u +%H:%M:%S) $*" >>"$LOG"
  probe || { echo "CHIP UNAVAILABLE, aborting" >>"$LOG"; exit 1; }
  timeout 3600 "$@" >>"$LOG" 2>&1
  echo "--- exit=$? $(date -u +%H:%M:%S)" >>"$LOG"
}

run python bench.py --e2e --length 100 --batch 40 --samples 400 --iters 2
echo "QUEUE I CELL1 DONE" >>"$LOG"
run python bench.py --e2e --length 300 --batch 8 --samples 200 --iters 2
echo "QUEUE I CELL2 DONE" >>"$LOG"
run python bench.py --length 300 --batch 8
echo "QUEUE I CELL3 DONE" >>"$LOG"
run python bench.py --e2e --length 1024 --batch 2 --samples 60 --fused --iters 2
echo "QUEUE I DONE" >>"$LOG"
