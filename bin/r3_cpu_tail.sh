#!/bin/bash
# CPU trend runs for the solver-family tail (VERDICT item 2 insurance).
#
# The TPU relay died 2026-08-17 ~19:11 (see CLAUDE.md round-3 learnings),
# so the paper-scale bridge/subtraj/euler-dds cells queued on the chip
# may never run this round. These scaled-down CPU runs (batch 256,
# 100-step EM grid, 1500 train steps, 5k eval) are NOT paper-scale
# numbers — they document that each solver trains stably end-to-end and
# that the logZ error declines, de-risking the round-4 chip runs.
#
# The box has ONE core and the TPU path needs it for host dispatch, so
# every run is watched: the moment the relay comes back (queue E will
# claim the chip) the CPU run is killed and the script exits.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r3

say() { echo "[r3cpu] $* $(date -u +%H:%M:%S)"; }
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
       eval_init=False plot_results=False eval_interval=1500"

run_cpu gmm_bridge_cpu_trend   target=gmm solver=bridge      $SMALL \
  train_timesteps.steps=100 || exit 0
run_cpu gmm_subtraj_cpu_trend  target=gmm solver=dis_subtraj $SMALL \
  train_timesteps.steps=100 || exit 0
# dds grids are dt-based: do NOT override train_timesteps.steps (CLAUDE.md)
run_cpu gmm_dds_euler_cpu_trend target=gmm solver=dds_euler  $SMALL || exit 0

say "ALL DONE"
