#!/bin/bash
# Round-2 TPU validation queue (sequential; the tunneled chip serializes
# programs anyway). Fills the ICLR'24 {DIS,PIS,DDS} x {kl,lv} grid on
# gmm/funnel/dw_shift at paper scale (final-only eval), then runs the
# whitened Cox at the full 60k budget (VERDICT items 1 and 2).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r2

run() {
  local name="$1"; shift
  if [ -f "logs/r2/$name/metrics.jsonl" ]; then
    echo "[queue] SKIP $name (already has metrics)"; return
  fi
  echo "[queue] START $name: $* $(date +%H:%M:%S)"
  python scripts/main.py "$@" out_dir="logs/r2/$name" \
    > "logs/r2/$name.log" 2>&1
  echo "[queue] DONE $name rc=$? $(date +%H:%M:%S)"
}

# 0. smoke: make sure the chip is alive before burning the queue
run smoke target=dw_shift solver=basic_dis train_steps=200 eval_batch_size=2000 eval_init=False

GRID_ARGS="eval_init=False eval_interval=60000"

# 1. missing LV cells
run gmm_pis_lv      target=gmm      solver=pis $GRID_ARGS
run gmm_dds_lv      target=gmm      solver=dds $GRID_ARGS
run dw_dis_lv       target=dw_shift solver=dis $GRID_ARGS
run dw_dds_lv       target=dw_shift solver=dds $GRID_ARGS
run funnel_pis_lv   target=funnel   solver=pis $GRID_ARGS

# 2. KL cells (full 3x3)
for tgt in gmm dw_shift funnel; do
  for sol in dis pis dds; do
    run "${tgt}_${sol}_kl" target=$tgt solver=$sol loss.method=kl $GRID_ARGS
  done
done

# 3. Cox whitened, full paper budget (VERDICT item 2)
run cox_whitened_60k target=cox +target.use_whitened=True solver=dis \
  train_steps=60000 train_batch_size=1024 eval_batch_size=100000 \
  eval_init=False eval_interval=20000

touch logs/r2/QUEUE_DONE
echo "[queue] ALL DONE $(date +%H:%M:%S)"
