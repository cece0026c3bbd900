#!/bin/bash
# Round-4 master chip queue — reordered from {bench_queue_r4,chip_queue2_r4}.sh
# so the highest-evidence items run first (VERDICT r3 ask ordering): if the
# session window closes mid-queue, the head is already on disk. One chip:
# strictly serialized, every job gated behind a cheap tunnel probe.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_master_r4.log}

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

# 0. Headline sanity + compile-cache warm for the driver's end-of-round run.
# (Done in the first launch: 318,469 structures/hr, vs_baseline 21.23.)
# run 2400 python bench.py

# 1. VERDICT 1a: SH3 stand-in prior (DSM pretrain on a synthetic ensemble
#    around the real 2vwf backbone).
run 5400 python scripts/pretrain_sh3_prior.py --ckpt_dir /tmp/sh3_prior \
    --output /tmp/sh3_prior_train_r4.json

# 1b. Gate: the prior must sample h with real spread, else the learning run
#     cannot demonstrate EV movement.
if python - >>"$LOG" 2>&1 <<'EOF'
import json, sys
s = json.load(open("/tmp/sh3_prior_train_r4.json"))["summary"]["sampled_h"]
q = s["quantiles"]
ok = s["mean"] > 0.02 and (q[-1] - q[0]) > 0.15
print("sampled_h gate:", "PASS" if ok else "FAIL", s)
sys.exit(0 if ok else 1)
EOF
then
  run 7200 python scripts/ppft_learning_run.py \
      --prior_params /tmp/sh3_prior/params.npz \
      --output /tmp/ppft_learning_r4.json
else
  echo "PRIOR GATE FAILED - skipping learning run (retune sigma/steps)" >>"$LOG"
fi

# 2. VERDICT 7: dead-zone stage 1 (does ti=128/tj=320 compile; raw cost).
run 3600 python scripts/probe_deadzone_r4.py --stage 1

# 3. VERDICT 2: parallel-in-time Picard vs the sequential EM scan.
run 2400 python bench.py --picard --length 100 --sweeps 8
run 2400 python bench.py --picard --length 100 --sweeps 25
run 2400 python bench.py --picard --length 100 --sweeps 50

# 4. VERDICT 3: DSM train-step throughput (checkpoint-size net).
run 2400 python bench.py --train --length 100
run 2400 python bench.py --train --length 100 --fused --bwd full
run 2400 python bench.py --train --length 100 --fused --bwd chunked
run 2400 python bench.py --train --length 256
run 2400 python bench.py --train --length 256 --fused --bwd full
run 2400 python bench.py --train --length 256 --fused --bwd chunked

# 5. VERDICT 4a: default solver (dpm_2m-30) long-L, both paths.
run 2400 python bench.py --solver dpm_2m --length 256 --batch 8
run 2400 python bench.py --solver dpm_2m --length 256 --batch 8 --fused
run 2400 python bench.py --solver dpm_2m --length 512 --batch 4
run 2400 python bench.py --solver dpm_2m --length 512 --batch 4 --fused
run 2400 python bench.py --solver dpm_2m --length 1024 --batch 2
run 2400 python bench.py --solver dpm_2m --length 1024 --batch 2 --fused

# 6. VERDICT 4b: end-to-end at long L with the fused path.
run 2400 python bench.py --e2e --length 512 --batch 4 --fused --samples 200

# 7. VERDICT 5: dispatch-model stress off the heuristic batch.
run 2400 python bench.py --solver dpm --length 256 --batch 1
run 2400 python bench.py --solver dpm --length 256 --batch 1 --fused
run 2400 python bench.py --solver dpm --length 256 --batch 16
run 2400 python bench.py --solver dpm --length 256 --batch 16 --fused

# 8. VERDICT 7: dead-zone stage 2 (end-to-end ragged vs legacy vs XLA).
run 7200 python scripts/probe_deadzone_r4.py --stage 2 --lengths 260,300,320

echo "QUEUE DONE $(date -u)" >>"$LOG"
