#!/bin/bash
# Phase 3 (idle-window extras after phase2): high-dim NICE benchmark and the
# Rosenbrock global-optimization use case at paper-ish scale.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r2

run() {
  local name="$1"; shift
  if [ -f "logs/r2/$name/metrics.jsonl" ]; then
    echo "[phase3] SKIP $name"; return
  fi
  echo "[phase3] START $name: $* $(date +%H:%M:%S)"
  python scripts/main.py "$@" out_dir="logs/r2/$name" \
    > "logs/r2/$name.log" 2>&1
  echo "[phase3] DONE $name rc=$? $(date +%H:%M:%S)"
}

# 196-d NICE flow target (committed synthetic-trained checkpoint; log Z = 0
# by construction since the flow is normalized)
run nice_dis_lv target=nice solver=dis eval_init=False eval_interval=60000

# Rosenbrock global optimization (objective metrics)
run rosenbrock_dis target=rosenbrock solver=dis train_steps=10000 \
  eval_init=False eval_interval=10000

touch logs/r2/PHASE3_DONE
echo "[phase3] ALL DONE $(date +%H:%M:%S)"
