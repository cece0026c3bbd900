#!/bin/bash
# Round-4 follow-up chip queue. Replaces chip_master_r4.sh's tail after the
# 50-step learning run came back with only a ~5% val descent (the near-zero
# control spends most of 50 steps at lr=5e-4 warming up — KL was still
# accelerating at step 50). Priority insert: a hotter, longer learning run
# (VERDICT r3 ask #1) ahead of the remaining bench cells; dead-zone stage 2
# stays last. Waits for the currently-running stage-1 probe to release the
# chip before starting.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_master_r4.log}
WAIT_PID=${2:-}

if [ -n "$WAIT_PID" ]; then
  echo "queue4: waiting for pid $WAIT_PID to release the chip" >>"$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

probe() {
  for i in $(seq 1 30); do
    if timeout 240 python -c "
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
  local T=$1; shift
  echo "=== $(date -u +%H:%M:%S) $*" >>"$LOG"
  probe || { echo "CHIP UNAVAILABLE, aborting queue" >>"$LOG"; exit 1; }
  timeout "$T" "$@" >>"$LOG" 2>&1
  echo "--- exit=$? $(date -u +%H:%M:%S)" >>"$LOG"
}

# 1. VERDICT 1 (stronger evidence): 100 steps at 4x the first run's lr.
run 7200 python scripts/ppft_learning_run.py \
    --prior_params /tmp/sh3_prior/params.npz \
    --steps 100 --lr 2e-3 --val_every 25 \
    --save_control /tmp/ppft_control_r4.npz \
    --output /tmp/ppft_learning_r4b.json

# 2. VERDICT 2: parallel-in-time Picard vs the sequential EM scan.
run 2400 python bench.py --picard --length 100 --sweeps 8
run 2400 python bench.py --picard --length 100 --sweeps 25
run 2400 python bench.py --picard --length 100 --sweeps 50

# 3. VERDICT 3: DSM train-step throughput (checkpoint-size net).
run 2400 python bench.py --train --length 100
run 2400 python bench.py --train --length 100 --fused --bwd full
run 2400 python bench.py --train --length 100 --fused --bwd chunked
run 2400 python bench.py --train --length 256
run 2400 python bench.py --train --length 256 --fused --bwd full
run 2400 python bench.py --train --length 256 --fused --bwd chunked

# 4. VERDICT 4a: default solver (dpm_2m-30) long-L, both paths.
run 2400 python bench.py --solver dpm_2m --length 256 --batch 8
run 2400 python bench.py --solver dpm_2m --length 256 --batch 8 --fused
run 2400 python bench.py --solver dpm_2m --length 512 --batch 4
run 2400 python bench.py --solver dpm_2m --length 512 --batch 4 --fused
run 2400 python bench.py --solver dpm_2m --length 1024 --batch 2
run 2400 python bench.py --solver dpm_2m --length 1024 --batch 2 --fused

# 5. VERDICT 4b: end-to-end at long L with the fused path.
run 2400 python bench.py --e2e --length 512 --batch 4 --fused --samples 200

# 6. VERDICT 5: dispatch-model stress off the heuristic batch.
run 2400 python bench.py --solver dpm --length 256 --batch 1
run 2400 python bench.py --solver dpm --length 256 --batch 1 --fused
run 2400 python bench.py --solver dpm --length 256 --batch 16
run 2400 python bench.py --solver dpm --length 256 --batch 16 --fused

# 7. VERDICT 7: dead-zone stage 2 (end-to-end ragged vs legacy vs XLA).
run 7200 python scripts/probe_deadzone_r4.py --stage 2 --lengths 260,300,320

echo "QUEUE DONE $(date -u)" >>"$LOG"
