#!/bin/bash
# Round-5 chip queue G: short-L e2e sanity after the mmap/bulk staging
# change — the published L=100 default-protocol cell must not regress,
# and its stage/loop/write breakdown gets captured. Waits for queue F.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_queue_r5g.log}
QFLOG=${2:-/tmp/chip_queue_r5f.log}

echo "waiting for queue F ($QFLOG)" >>"$LOG"
for i in $(seq 1 420); do
  grep -q "QUEUE F DONE" "$QFLOG" 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE F DONE" "$QFLOG" || echo "queue F never finished; proceeding" >>"$LOG"

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

# Published cell: 303,696/hr (97.0% of device-only), bench_r5_fixes.json.
run python bench.py --e2e --length 100 --batch 40 --samples 400 --iters 2
echo "QUEUE G DONE" >>"$LOG"
