#!/bin/bash
# Round-5 chip queue F: final-design long-L e2e cells. Runs after queue E's
# staging probe: (1) L=1024 e2e with the settled staging spelling (mmap
# load + one bulk upload), (2) L=300/B=8 e2e — the XLA dead-zone length the
# reference publishes (40 min / 1000 samples on A100, bioemu/README.md:57).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_queue_r5f.log}
QELOG=${2:-/tmp/chip_queue_r5e.log}

echo "waiting for queue E ($QELOG)" >>"$LOG"
for i in $(seq 1 360); do
  grep -q "QUEUE E PROBE DONE" "$QELOG" 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE E PROBE DONE" "$QELOG" || echo "queue E never finished; proceeding" >>"$LOG"

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
run python bench.py --e2e --length 300 --batch 8 --samples 200 --iters 2
echo "QUEUE F DONE" >>"$LOG"
