#!/bin/bash
# Round-3 priority cells (run during the held window, before queue A resumes):
# 1. two-phase fast-path QUALITY A/B: funnel DIS at the full 60k budget on
#    the exact bench fast path — final metrics must land inside the
#    funnel_dis_lv seed spread (validates the 22x headline is the same
#    estimator, not a different algorithm).
# 2-3. NICE-196d diagnosis cells (VERDICT r2 item 4): DDS solver; DIS with
#    a 2x finer EM grid.
set -u
cd "$(dirname "$0")/.."
run() {
  local name="$1"; shift
  if [ -f "logs/r3/$name/metrics.jsonl" ]; then echo "[r3c] SKIP $name"; return; fi
  echo "[r3c] START $name: $* $(date -u +%H:%M:%S)"
  python scripts/main.py "$@" out_dir="logs/r3/$name" > "logs/r3/$name.log" 2>&1
  echo "[r3c] DONE $name rc=$? $(date -u +%H:%M:%S)"
}

GRID_ARGS="eval_init=False eval_interval=60000"

run funnel_dis_lv_twophase target=funnel solver=dis \
  +loss.two_phase=True +loss.noise_pregen=True +loss.scan_unroll=8 \
  $GRID_ARGS

run nice_dds_lv target=nice solver=dds $GRID_ARGS
run nice_dis_lv_fine target=nice solver=dis train_timesteps.steps=400 \
  $GRID_ARGS

echo "[r3c] ALL DONE; releasing chip hold"
rm -f /tmp/chip_hold
