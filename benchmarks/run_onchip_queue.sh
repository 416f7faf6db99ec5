#!/usr/bin/env bash
# Drain the pending on-chip validation queue (see docs/ROADMAP.md) once the
# axon TPU tunnel answers. Designed for the tunnel's failure modes:
#   - every item gets its own generous timeout (remote Pallas compiles can
#     take minutes; a hung backend must not wedge the queue forever);
#   - output goes straight to per-item log files (NEVER through `| tail`,
#     which buffers until exit and hides progress);
#   - items are independent: one failure doesn't stop the rest.
# Usage:  bash benchmarks/run_onchip_queue.sh [logdir]   (default /tmp/onchip)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/onchip}"
mkdir -p "$LOG"

echo "[queue] probing backend health..."
if ! timeout 90 python -c "import jax; print(jax.devices())" \
     > "$LOG/probe.log" 2>&1; then
  echo "[queue] backend DOWN (probe hung/failed; see $LOG/probe.log)"; exit 3
fi
echo "[queue] backend healthy: $(grep -io 'tpu[^]]*' "$LOG/probe.log" | head -1)"

run() {  # run NAME TIMEOUT_S CMD... — log to $LOG/NAME.log, record status
  local name="$1" to="$2"; shift 2
  echo "[queue] $name: $* (timeout ${to}s)"
  local t0=$SECONDS
  if timeout "$to" "$@" > "$LOG/$name.log" 2>&1; then
    echo "[queue] $name: OK ($((SECONDS - t0))s)"
  else
    echo "[queue] $name: FAILED rc=$? ($((SECONDS - t0))s) — $LOG/$name.log"
  fi
}

# 1. every shipped Pallas kernel vs its jnp oracle on the real chip
run parity   2400 python benchmarks/check_tpu_parity.py
# 2. pool design-space measurement (perceptual trunk; --resume re-measures
#    only rows missing from the committed pool_alts.json)
run pool     2400 python benchmarks/bench_pool_alts.py --resume
# 3. fresh headline (writes the driver JSON line)
run bench    1200 python bench.py
# 4. short real train run: best-checkpoint/eval_loss path on-chip
run pong64   2400 python -m keypoints_tpu.train --preset pong64 \
    --steps 1000 --override train.checkpoint_dir=/tmp/onchip_ck \
    train.log_every=200 train.eval_every=500 train.checkpoint_every=500
# 5. pose256 b128 preset-default sanity (expect ~577 fps, 11.9 GiB peak)
run pose256  3600 python -m keypoints_tpu.train --preset pose256 \
    --steps 500 --override train.checkpoint_dir=/tmp/onchip_ck_pose \
    train.log_every=100 train.eval_every=500 train.checkpoint_every=500
# 6. LIVE quality gate (VERDICT r4 #5): one pinned healthy seed per preset
#    re-trained from current code; exits nonzero if locking regressed
run smoke    3600 python benchmarks/quality_sweep.py --smoke

echo "[queue] done — logs in $LOG"
