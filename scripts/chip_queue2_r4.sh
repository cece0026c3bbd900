#!/bin/bash
# Round-4 chip chain, part 2: waits for bench_queue_r4.sh to drain, then
# runs (1) the dead-zone raw-kernel probe, (2) the SH3 prior pretrain,
# (3) the PPFT learning run at the reference shape (gated on the prior's
# sampled-h spread), (4) the dead-zone pipeline sweep. Serialized: one chip.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export SE3DIFF_COMPILATION_CACHE_DIR="$HOME/.se3diff_xla_cache"
LOG=${1:-/tmp/chip_queue2_r4.log}
Q1LOG=${2:-/tmp/bench_queue_r4.log}

echo "waiting for queue 1 ($Q1LOG)" >>"$LOG"
for i in $(seq 1 720); do
  grep -q "QUEUE DONE" "$Q1LOG" 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE DONE" "$Q1LOG" || echo "queue1 never finished; proceeding anyway" >>"$LOG"

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
  timeout 7200 "$@" >>"$LOG" 2>&1
  echo "--- exit=$? $(date -u +%H:%M:%S)" >>"$LOG"
}

# (1) Dead-zone stage 1: does (ti=128, tj=320) compile, and per-layer cost.
run python scripts/probe_deadzone_r4.py --stage 1

# (2) SH3 prior pretrain (writes /tmp/sh3_prior/params.npz + artifact).
run python scripts/pretrain_sh3_prior.py --ckpt_dir /tmp/sh3_prior \
    --output /tmp/sh3_prior_train_r4.json

# (3) Gate: the prior must sample h with real spread, else the learning run
# cannot demonstrate EV movement (record and stop for manual retuning).
if python - <<'EOF'
import json, sys
s = json.load(open("/tmp/sh3_prior_train_r4.json"))["summary"]["sampled_h"]
q = s["quantiles"]
ok = s["mean"] > 0.02 and (q[-1] - q[0]) > 0.15
print("sampled_h gate:", "PASS" if ok else "FAIL", s)
sys.exit(0 if ok else 1)
EOF
then
  run python scripts/ppft_learning_run.py \
      --prior_params /tmp/sh3_prior/params.npz \
      --output /tmp/ppft_learning_r4.json
else
  echo "PRIOR GATE FAILED - skipping learning run (retune sigma/steps)" >>"$LOG"
fi

# (4) Dead-zone stage 2: end-to-end dpm-30 sweep, ragged vs legacy vs XLA.
run python scripts/probe_deadzone_r4.py --stage 2 --lengths 260,300,320

echo "QUEUE2 DONE $(date -u)" >>"$LOG"
