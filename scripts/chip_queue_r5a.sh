#!/bin/bash
# Round-5 chip queue A: train-path kernel crossover cells (VERDICT r4 ask
# #7). Round 4 measured the DSM train step at L=100 (XLA wins by 8%) and
# L=256 (post-NaN-fix chunked wins by 3%); the crossover between them and
# the long-L trend are unmeasured, so the train-path "auto" default can't
# be fit. Cells: L=192 B=16 and L=384 B=6, XLA vs fused-chunked.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_queue_r5a.log}

probe() {
  for i in $(seq 1 30); do
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
  timeout 3600 "$@" >>"$LOG" 2>&1
  echo "--- exit=$? $(date -u +%H:%M:%S)" >>"$LOG"
}

run python bench.py --train --length 192 --batch 16
run python bench.py --train --length 192 --batch 16 --fused --bwd chunked
run python bench.py --train --length 384 --batch 6
run python bench.py --train --length 384 --batch 6 --fused --bwd chunked
echo "QUEUE A DONE" >>"$LOG"
