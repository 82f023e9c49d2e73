#!/bin/bash
# Round-3 chip queue, part A: liveness smoke + seed replicates for the
# headline LV cells (VERDICT r2 item 3 — report mean±std over >=3 seeds).
# Known-good configs only; new-config runs go through bin/r3_queue_b.sh
# after CPU smokes pass.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r3

# Pause mechanism: touch /tmp/chip_hold to keep the queue off the chip
# (e.g. for interactive perf experiments); rm it to resume.
hold() { while [ -f /tmp/chip_hold ]; do sleep 30; done; }

DEADLINE="${R3_DEADLINE:-00:30}"
past_deadline() {
  local now=$(date -u +%H:%M)
  # deadline is past midnight; "past" means between DEADLINE and 12:00
  [ "$now" \> "$DEADLINE" ] && [ "$now" \< "12:00" ]
}

run() {
  local name="$1"; shift
  if [ -f "logs/r3/$name/metrics.jsonl" ]; then
    echo "[r3a] SKIP $name"; return
  fi
  if past_deadline; then echo "[r3a] DEADLINE — skip $name"; return; fi
  hold
  echo "[r3a] START $name: $* $(date -u +%H:%M:%S)"
  python scripts/main.py "$@" out_dir="logs/r3/$name" \
    > "logs/r3/$name.log" 2>&1
  echo "[r3a] DONE $name rc=$? $(date -u +%H:%M:%S)"
}

run smoke target=dw_shift solver=basic_dis train_steps=200 \
  eval_batch_size=2000 eval_init=False

GRID_ARGS="eval_init=False eval_interval=60000"

# Seed replicates (seed=1 is the default used by the recorded grid cells)
run gmm_dis_lv_seed2    target=gmm    solver=dis seed=2 $GRID_ARGS
run gmm_dis_lv_seed3    target=gmm    solver=dis seed=3 $GRID_ARGS
run funnel_dis_lv_seed2 target=funnel solver=dis seed=2 $GRID_ARGS
run funnel_dis_lv_seed3 target=funnel solver=dis seed=3 $GRID_ARGS
run dw_dds_lv_seed2     target=dw_shift solver=dds seed=2 $GRID_ARGS
run dw_dds_lv_seed3     target=dw_shift solver=dds seed=3 $GRID_ARGS

touch logs/r3/QUEUE_A_DONE
echo "[r3a] ALL DONE $(date -u +%H:%M:%S)"
