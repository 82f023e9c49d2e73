#!/bin/bash
# Phase 1b: the mw (d=5, 5 wells, separation 4 — the ICLR'24 many-well
# benchmark) cells of the {DIS,PIS,DDS} x {kl,lv} grid.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r2

run() {
  local name="$1"; shift
  if [ -f "logs/r2/$name/metrics.jsonl" ]; then
    echo "[queue-mw] SKIP $name"; return
  fi
  echo "[queue-mw] START $name $(date +%H:%M:%S)"
  python scripts/main.py "$@" out_dir="logs/r2/$name" \
    > "logs/r2/$name.log" 2>&1
  echo "[queue-mw] DONE $name rc=$? $(date +%H:%M:%S)"
}

GRID_ARGS="eval_init=False eval_interval=60000"
for sol in dis pis dds; do
  run "mw_${sol}_lv" target=mw solver=$sol $GRID_ARGS
  run "mw_${sol}_kl" target=mw solver=$sol loss.method=kl $GRID_ARGS
done
touch logs/r2/QUEUE_MW_DONE
echo "[queue-mw] ALL DONE $(date +%H:%M:%S)"
