#!/bin/bash
# Round-3 chip queue, part B: the new-config paper-scale runs (VERDICT r2
# items 2, 3, 5, 8). Waits for queue A to release the chip and for the CPU
# smoke suite (bin/r3_smoke.sh) to have validated every config.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r3

hold() { while [ -f /tmp/chip_hold ]; do sleep 30; done; }

DEADLINE="${R3_DEADLINE:-00:30}"
past_deadline() {
  local now=$(date -u +%H:%M)
  [ "$now" \> "$DEADLINE" ] && [ "$now" \< "12:00" ]
}

run() {
  local name="$1"; shift
  if [ -f "logs/r3/$name/metrics.jsonl" ]; then
    echo "[r3b] SKIP $name"; return
  fi
  if past_deadline; then echo "[r3b] DEADLINE — skip $name"; return; fi
  hold
  echo "[r3b] START $name: $* $(date -u +%H:%M:%S)"
  python scripts/main.py "$@" out_dir="logs/r3/$name" \
    > "logs/r3/$name.log" 2>&1
  echo "[r3b] DONE $name rc=$? $(date -u +%H:%M:%S)"
}

echo "[r3b] waiting for smoke + queue A"
while [ ! -f logs/r3_smoke/ALL_OK ]; do sleep 60; done
while [ ! -f logs/r3/QUEUE_A_DONE ]; do sleep 60; done

GRID_ARGS="eval_init=False eval_interval=60000"

# 1. Solver-family tail at paper scale (TMLR'24 bridge/subtraj solvers)
run gmm_bridge_lv    target=gmm solver=bridge      $GRID_ARGS
run gmm_dis_subtraj  target=gmm solver=dis_subtraj $GRID_ARGS
run gmm_dds_euler    target=gmm solver=dds_euler   $GRID_ARGS

# 2. kl_ito / lv_traj estimator columns
for tgt in funnel dw_shift mw; do
  run ${tgt}_dis_kl_ito  target=$tgt solver=dis loss.method=kl_ito $GRID_ARGS
  run ${tgt}_dis_lv_traj target=$tgt solver=dis loss.method=lv_traj \
    loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS
done

# 3. Straggler re-runs under current code
run mw_50d_dis target=mw_50d solver=dis $GRID_ARGS
run rosenbrock_dis_60k target=rosenbrock solver=dis $GRID_ARGS

# 4. Cox from the standard pipeline with the NEW default 800-step eval
#    grid (conf/target/cox.yaml) — reproduces rel err <=0.03 in one command.
run cox_whitened_60k target=cox +target.use_whitened=True solver=dis \
  train_steps=60000 train_batch_size=1024 eval_batch_size=100000 \
  eval_init=False eval_interval=20000

# 5. Optional round-2-ification (judge: "optionally rings/img")
run rings_dis_lv target=rings solver=dis $GRID_ARGS
run img_dis_lv target=img solver=dis train_steps=10000 \
  eval_init=False eval_interval=10000

touch logs/r3/QUEUE_B_DONE
echo "[r3b] ALL DONE $(date -u +%H:%M:%S)"

# round-3 cleanup: gmm seed3 had two concurrent writers (dup queue instances);
# redo it cleanly after the main queue-B list.
run gmm_dis_lv_seed3 target=gmm solver=dis seed=3 $GRID_ARGS
touch logs/r3/QUEUE_B2_DONE
