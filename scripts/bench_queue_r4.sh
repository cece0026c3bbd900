#!/bin/bash
# Round-4 measurement queue (VERDICT asks 3, 4, 5): serialized bench runs on
# the one real chip, gated behind a cheap probe loop (the axon tunnel can be
# down for hours). Each line prints its own JSON; everything tees to the log.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/bench_queue_r4.log}

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
  probe || { echo "CHIP UNAVAILABLE, aborting queue" >>"$LOG"; exit 1; }
  timeout 2400 python bench.py "$@" >>"$LOG" 2>&1
  echo "--- exit=$? $(date -u +%H:%M:%S)" >>"$LOG"
}

# VERDICT 3: DSM train-step throughput (checkpoint-size net).
run --train --length 100
run --train --length 100 --fused --bwd full
run --train --length 100 --fused --bwd chunked
run --train --length 256
run --train --length 256 --fused --bwd full
run --train --length 256 --fused --bwd chunked

# VERDICT 4a: default solver (dpm_2m-30) long-L, both paths (batches match
# the README dpm table so the two protocols are comparable per-L).
run --solver dpm_2m --length 256 --batch 8
run --solver dpm_2m --length 256 --batch 8 --fused
run --solver dpm_2m --length 512 --batch 4
run --solver dpm_2m --length 512 --batch 4 --fused
run --solver dpm_2m --length 1024 --batch 2
run --solver dpm_2m --length 1024 --batch 2 --fused

# VERDICT 4b: end-to-end at long L with the fused path (host tail overlap).
run --e2e --length 512 --batch 4 --fused --samples 200

# VERDICT 5: dispatch-model stress off the heuristic batch (anchors are
# dpm-based, so measure the same protocol).
run --solver dpm --length 256 --batch 1
run --solver dpm --length 256 --batch 1 --fused
run --solver dpm --length 256 --batch 16
run --solver dpm --length 256 --batch 16 --fused

# VERDICT 2: parallel-in-time Picard vs the sequential EM scan, at the
# shape most favorable to Picard (B=1 starves the chip; Picard batches the
# whole 200-step trajectory per sweep). L=100 keeps the batched x2d
# broadcast (~0.5 GB) comfortably in HBM.
run --picard --length 100 --sweeps 8
run --picard --length 100 --sweeps 25
run --picard --length 100 --sweeps 50

echo "QUEUE DONE $(date -u)" >>"$LOG"
