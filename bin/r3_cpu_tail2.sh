#!/bin/bash
# CPU trend runs #2: estimator-column insurance (VERDICT item 3).
# Matched-budget pairs on funnel — kl vs kl_ito, lv vs lv_traj — so the
# qualitative acceptance claims (kl_ito ~= kl, lv_traj ~= lv) have
# *some* evidence this round despite the relay outage. Same watch
# pattern as bin/r3_cpu_tail.sh: cede the core if the relay returns.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r3

say() { echo "[r3cpu2] $* $(date -u +%H:%M:%S)"; }
relay_up() { timeout 2 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; }

HARD_STOP=$(date -ud '2026-08-18 00:55' +%s)

run_cpu() {
  local name="$1"; shift
  if [ -f "logs/r3/$name/metrics.jsonl" ]; then
    say "SKIP $name (exists)"; return 0
  fi
  if [ $(( HARD_STOP - $(date -u +%s) )) -lt 300 ]; then
    say "HARD STOP — skip $name"; return 1
  fi
  say "START $name: $*"
  env -u PYTHONPATH JAX_PLATFORMS=cpu \
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    nice -n 10 python scripts/main.py "$@" out_dir="logs/r3/$name" \
    > "logs/r3/$name.log" 2>&1 &
  local pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    if relay_up; then
      say "RELAY BACK — killing $name, ceding the core to queue E"
      kill "$pid" 2>/dev/null
      return 1
    fi
    if [ $(( HARD_STOP - $(date -u +%s) )) -lt 60 ]; then
      say "HARD STOP — killing $name"
      kill "$pid" 2>/dev/null
      return 1
    fi
    sleep 30
  done
  wait "$pid"
  say "DONE $name rc=$?"
}

SMALL="train_steps=1500 train_batch_size=256 eval_batch_size=5000
       eval_init=False plot_results=False eval_interval=1500
       train_timesteps.steps=100"

run_cpu funnel_dis_kl_cpu_trend     target=funnel solver=dis \
  loss.method=kl $SMALL || exit 0
run_cpu funnel_dis_kl_ito_cpu_trend target=funnel solver=dis \
  loss.method=kl_ito $SMALL || exit 0
run_cpu funnel_dis_lv_cpu_trend     target=funnel solver=dis $SMALL || exit 0
# lv_traj: 8 trajectories per sample — shrink the batch to keep the cost
# matched (256/8=32 samples x 8 trajs = the same 256 rollouts/step)
run_cpu funnel_dis_lv_traj_cpu_trend target=funnel solver=dis \
  loss.method=lv_traj loss.traj_per_sample=8 train_steps=1500 \
  train_batch_size=32 eval_batch_size=5000 eval_init=False \
  plot_results=False eval_interval=1500 train_timesteps.steps=100 || exit 0

say "ALL DONE"
