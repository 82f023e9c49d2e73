#!/bin/bash
# Phase 4 (idle-window, priority order):
#   1. Re-run the LV cells whose paper-scale numbers were only recorded in
#      round 1 (round-1 logs were wiped), completing the round-2 grid table.
#   2. Bonus loss methods (lv_traj, kl_ito) and seed replicates.
#   (The planned Cox training extension was dropped: fine-grid evals of the
#   60k checkpoint showed the plateau was EM discretization bias — eval at
#   800 steps already hits rel err 0.023, see RESULTS.md Notes on Cox.)
# A deadline guard keeps the chip free for the driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r2

# Skip new launches after this time (UTC, HH:MM) — round ends ~07:12 and the
# driver benches on the real chip; leave it quiet well before.
DEADLINE="${R2_PHASE4_DEADLINE:-06:25}"

past_deadline() {
  [ "$(date -u +%H:%M)" \> "$DEADLINE" ]
}

run() {
  local name="$1"; shift
  if [ -f "logs/r2/$name/metrics.jsonl" ]; then
    echo "[phase4] SKIP $name"; return
  fi
  if past_deadline; then
    echo "[phase4] DEADLINE ($DEADLINE UTC) passed — skipping $name"; return
  fi
  echo "[phase4] START $name: $* $(date +%H:%M:%S)"
  python scripts/main.py "$@" out_dir="logs/r2/$name" \
    > "logs/r2/$name.log" 2>&1
  echo "[phase4] DONE $name rc=$? $(date +%H:%M:%S)"
}

GRID_ARGS="eval_init=False eval_interval=60000"
# 2. round-1-only LV cells
run gmm_dis_lv    target=gmm      solver=dis $GRID_ARGS
run dw_pis_lv     target=dw_shift solver=pis $GRID_ARGS
run funnel_dis_lv target=funnel   solver=dis $GRID_ARGS
run funnel_dds_lv target=funnel   solver=dds $GRID_ARGS

# 3. Bonus loss methods + seed replicates
run gmm_dis_lv_traj target=gmm solver=dis loss.method=lv_traj loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS
run gmm_dis_kl_ito  target=gmm solver=dis loss.method=kl_ito $GRID_ARGS
run gmm_dis_lv_seed1 target=gmm solver=dis seed=1 $GRID_ARGS
run gmm_dis_lv_seed2 target=gmm solver=dis seed=2 $GRID_ARGS

touch logs/r2/PHASE4_DONE
echo "[phase4] ALL DONE $(date +%H:%M:%S)"
