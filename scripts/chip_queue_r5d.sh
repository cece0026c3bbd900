#!/bin/bash
# Round-5 chip queue D: re-measure long-L e2e after the fixed-cost fix
# (mmap'd load_embeds + slab-staged conditioning — the ~23 s of host-cliff
# copies per run at L=1024). Waits for queue C; one chip.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_queue_r5d.log}
QCLOG=${2:-/tmp/chip_queue_r5c.log}

echo "waiting for queue C ($QCLOG)" >>"$LOG"
for i in $(seq 1 360); do
  grep -q "QUEUE C DONE" "$QCLOG" 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE C DONE" "$QCLOG" || echo "queue C never finished; proceeding" >>"$LOG"

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

# Same cell as queue C's L=1024 run, post-fix (pre-fix: 4983.0/hr, 64.7%
# of the 7695.8/hr device-only rate; excess was per-run load+stage).
run python bench.py --e2e --length 1024 --batch 2 --samples 60 --fused --iters 2
# L=512 sanity: the staging fix's 24221.2/hr (93.8%) must not regress.
run python bench.py --e2e --length 512 --batch 4 --samples 200 --fused --iters 2
echo "QUEUE D DONE" >>"$LOG"
