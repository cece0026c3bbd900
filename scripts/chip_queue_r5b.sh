#!/bin/bash
# Round-5 chip queue B: (1) verify the long-L end-to-end fix (conditioning
# staged once per run — sampling/pipeline.py stage_conditioning) at L=512
# and re-check L=100; (2) the PPFT learning protocol THROUGH the product
# trainer (scripts/ppft_trainer_run_r5.py), unguarded (reference behavior)
# then kl_guard A/B. Waits for queue A to drain first; one chip.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_queue_r5b.log}
QALOG=${2:-/tmp/chip_queue_r5a.log}

echo "waiting for queue A ($QALOG)" >>"$LOG"
for i in $(seq 1 360); do
  grep -q "QUEUE A DONE" "$QALOG" 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE A DONE" "$QALOG" || echo "queue A never finished; proceeding" >>"$LOG"

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

# (1) End-to-end after the staging fix: the L=512 collapse cell, then the
# L=100 headline re-check (should hold ~98% of device-only).
run python bench.py --e2e --length 512 --batch 4 --samples 200 --fused --iters 2
run python bench.py --e2e --length 100 --batch 40 --samples 400 --iters 2

# (2) PPFT through the product trainer: reference behavior first.
run python scripts/ppft_trainer_run_r5.py \
    --prior_params /tmp/sh3_prior/params.npz \
    --output_dir /tmp/ppft_trainer_r5_ref

# (3) kl_guard A/B from the same init/seeds.
run python scripts/ppft_trainer_run_r5.py \
    --prior_params /tmp/sh3_prior/params.npz \
    --kl_guard 80 \
    --output_dir /tmp/ppft_trainer_r5_guard

echo "QUEUE B DONE" >>"$LOG"
