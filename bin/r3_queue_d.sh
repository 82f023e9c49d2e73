#!/bin/bash
# Round-3 consolidated priority queue (supersedes killed queues B/C).
# Order = judge's VERDICT priority with a hard chip-release time so the
# driver's end-of-round bench.py run gets an idle chip:
#   quick validation wins -> gmm 3rd seed -> solver-family tail (item 2)
#   -> kl_ito estimator column (item 3; gmm already has kl_ito+lv_traj
#   from r2) -> Cox from the standard pipeline with the new 800-step
#   eval default (item 5; eval_interval=20000 so a truncated run still
#   records 20k/40k evals) -> lv_traj columns -> nice_smooth 196-d cell
#   (item 4 upside; root-cause writeup already in RESULTS.md) -> item-8
#   stragglers. Each run is wrapped in `timeout` against HARD_STOP so
#   whatever is in flight dies cleanly and the chip is idle afterwards.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r3

# Round 3 started 2026-08-17 ~13:10 UTC; expect the driver to end it
# ~01:10 UTC. Release the chip by 00:45 for the driver's bench run.
HARD_STOP=$(date -ud '2026-08-18 00:45' +%s)

echo "[r3d] waiting for queue A"
while [ ! -f logs/r3/QUEUE_A_DONE ]; do sleep 10; done

# run [cap_seconds] name args...  — cap bounds a single run (defense
# against a re-wedged chip eating the whole budget); the hard stop
# always applies on top.
run() {
  local cap=0
  case "$1" in (*[!0-9]*) ;; (*) cap="$1"; shift;; esac
  local name="$1"; shift
  if [ -f "logs/r3/$name/metrics.jsonl" ]; then
    echo "[r3d] SKIP $name (exists)"; return
  fi
  local remaining=$(( HARD_STOP - $(date -u +%s) ))
  if [ "$remaining" -lt 600 ]; then
    echo "[r3d] HARD STOP reached — skip $name"; return
  fi
  if [ "$cap" -gt 0 ] && [ "$cap" -lt "$remaining" ]; then
    remaining=$cap
  fi
  echo "[r3d] START $name (budget ${remaining}s): $* $(date -u +%H:%M:%S)"
  timeout "$remaining" python scripts/main.py "$@" \
    out_dir="logs/r3/$name" > "logs/r3/$name.log" 2>&1
  echo "[r3d] DONE $name rc=$? $(date -u +%H:%M:%S)"
}

GRID_ARGS="eval_init=False eval_interval=60000"

# --- quick validation wins ----------------------------------------------
# clean re-eval of the two-phase A/B checkpoint through the standard eval
# path (eval-only resume: same out_dir, fast-path overrides dropped)
if [ -f logs/r3/funnel_dis_lv_twophase/ckpt/ckpt_final.pkl ] && \
   [ ! -f logs/r3/funnel_dis_lv_twophase/REEVAL_DONE ]; then
  echo "[r3d] START twophase_reeval $(date -u +%H:%M:%S)"
  timeout 1800 python scripts/main.py target=funnel solver=dis $GRID_ARGS \
    out_dir=logs/r3/funnel_dis_lv_twophase \
    > logs/r3/funnel_dis_lv_twophase.reeval.log 2>&1 \
    && touch logs/r3/funnel_dis_lv_twophase/REEVAL_DONE
  echo "[r3d] DONE twophase_reeval rc=$? $(date -u +%H:%M:%S)"
fi

# production wall-clock probe of the fast path at CURRENT defaults
run 1800 funnel_fast_prod_probe target=funnel solver=dis \
  +loss.two_phase=True +loss.noise_pregen=True +loss.scan_unroll=8 \
  train_steps=3000 eval_batch_size=2000 eval_init=False \
  eval_interval=3000 plot_results=False

# --- seed replicate completing the gmm triple (dup-writer redo) ----------
run 2700 gmm_dis_lv_seed3 target=gmm solver=dis seed=3 $GRID_ARGS

# --- VERDICT item 2: solver-family tail at paper scale -------------------
run 3600 gmm_bridge_lv    target=gmm solver=bridge      $GRID_ARGS
run 3600 gmm_dis_subtraj  target=gmm solver=dis_subtraj $GRID_ARGS
run 3600 gmm_dds_euler    target=gmm solver=dds_euler   $GRID_ARGS

# --- VERDICT item 3: kl_ito estimator column (gmm cell exists from r2;
#     funnel only before cox — the d=1 pallas wedge cost ~1.5h of chip,
#     so cox must start by ~22:50 to record its 40k-step eval) ---------
run 3600 funnel_dis_kl_ito   target=funnel   solver=dis loss.method=kl_ito $GRID_ARGS

# --- VERDICT item 5: Cox from the standard pipeline (800-step eval default)
run cox_whitened_60k target=cox +target.use_whitened=True solver=dis \
  train_steps=60000 train_batch_size=1024 eval_batch_size=100000 \
  eval_init=False eval_interval=20000

# --- VERDICT item 3 (rest): remaining kl_ito + lv_traj columns -----------
run dw_shift_dis_kl_ito target=dw_shift solver=dis loss.method=kl_ito $GRID_ARGS
run mw_dis_kl_ito       target=mw       solver=dis loss.method=kl_ito $GRID_ARGS
# --- VERDICT item 3 (rest 2): lv_traj columns ------------------------------
run funnel_dis_lv_traj target=funnel solver=dis loss.method=lv_traj \
  loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS
run dw_shift_dis_lv_traj target=dw_shift solver=dis loss.method=lv_traj \
  loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS
run mw_dis_lv_traj target=mw solver=dis loss.method=lv_traj \
  loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS

# --- VERDICT item 4 upside: tractable 196-d cell --------------------------
if [ -f logs/r3/NICE_SMOOTH_VALIDATED ]; then
  run nice_smooth_dis_lv target=nice_smooth solver=dis \
    eval_init=False eval_interval=20000
fi

# --- VERDICT item 8: stragglers -------------------------------------------
run mw_50d_dis target=mw_50d solver=dis $GRID_ARGS
run rosenbrock_dis_60k target=rosenbrock solver=dis $GRID_ARGS
run rings_dis_lv target=rings solver=dis $GRID_ARGS
run img_dis_lv target=img solver=dis train_steps=10000 \
  eval_init=False eval_interval=10000

touch logs/r3/QUEUE_D_DONE
echo "[r3d] ALL DONE $(date -u +%H:%M:%S)"
