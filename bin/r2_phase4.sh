#!/bin/bash
# Phase 4 (idle-window): re-run the LV cells whose paper-scale numbers were
# only recorded in round 1 (the round-1 logs were wiped by the workspace
# reset), so logs/r2 holds the complete {DIS,PIS,DDS} x {KL,LV} grid and
# scripts/collect_results.py can render one self-contained table.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r2

run() {
  local name="$1"; shift
  if [ -f "logs/r2/$name/metrics.jsonl" ]; then
    echo "[phase4] SKIP $name"; return
  fi
  echo "[phase4] START $name: $* $(date +%H:%M:%S)"
  python scripts/main.py "$@" out_dir="logs/r2/$name" \
    > "logs/r2/$name.log" 2>&1
  echo "[phase4] DONE $name rc=$? $(date +%H:%M:%S)"
}

GRID_ARGS="eval_init=False eval_interval=60000"
run gmm_dis_lv    target=gmm      solver=dis $GRID_ARGS
run dw_pis_lv     target=dw_shift solver=pis $GRID_ARGS
run funnel_dis_lv target=funnel   solver=dis $GRID_ARGS
run funnel_dds_lv target=funnel   solver=dds $GRID_ARGS

touch logs/r2/PHASE4_DONE
echo "[phase4] ALL DONE $(date +%H:%M:%S)"
