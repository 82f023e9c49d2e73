#!/bin/bash
# Round-4 tail queue (launched 23:57 UTC Aug-18 after the third VM reboot
# wiped logs/). ~35 min of chip budget before the driver's round-end
# bench: the 60k-step grid cells do NOT fit safely (the budget-sizing
# lesson from the 14:13 takeover), so run the three small bounded items:
#   1. phase2 compile profile        (VERDICT r4 #5, ~6-9 min cold)
#   2. funnel fast-path prod probe   (validates the flipped default)
#   3. AlaDip eval-set generation    (durable data/ artifact, unblocks
#      the aladip_vacuum_dis cell next round)
# Usage: bash bin/r4_tail.sh 'YYYY-MM-DD HH:MM'
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r4 results/r4

exec 9>logs/r4_tail.lock
flock -n 9 || { echo "[r4t] another instance holds the lock"; exit 1; }
echo $$ > logs/r4_tail.pid

HARD_STOP=$(date -ud "${1:?HARD_STOP required}" +%s)

now() { date -u +%s; }
say() { echo "[r4t] $* $(date -u +%H:%M:%S)"; }
relay_up() { timeout 2 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; }

commit_paths() {
  local msg="$1"; shift
  for _ in 1 2 3; do
    if git add -- "$@" >/dev/null 2>&1 && \
       git commit -q -m "$msg" -- "$@" >/dev/null 2>&1; then
      say "HARVEST committed: $msg"; return 0
    fi
    sleep 7
  done
  say "HARVEST commit failed (left in worktree): $msg"
  return 1
}

harvest() {
  # Only commit cells that actually produced metrics (advisor r4: a cell
  # that died pre-metrics must not create a results/ dir that the
  # skip-if-exists gate then treats as a completed cell).
  local name="$1"
  [ -d "logs/r4/$name" ] || return 0
  if [ ! -s "logs/r4/$name/metrics.jsonl" ]; then
    say "harvest $name: no metrics.jsonl — not committing"
    return 0
  fi
  mkdir -p "results/r4/$name"
  cp -f "logs/r4/$name/metrics.jsonl" "results/r4/$name/"
  local f
  for f in "logs/r4/$name"/*.yaml; do
    [ -f "$f" ] && cp -f "$f" "results/r4/$name/"
  done
  [ -f "logs/r4/$name.log" ] && \
    tail -c 20000 "logs/r4/$name.log" > "results/r4/$name/run.log.tail"
  commit_paths "r4 queue harvest: $name" "results/r4/$name"
}

relay_up || { say "relay down — abandoning tail queue"; exit 1; }

# --- 1. phase-2 compile profile (VERDICT r4 #5) -----------------------------
if [ ! -f results/r4/phase2_compile.json ] && \
   [ $(( HARD_STOP - $(now) )) -gt 420 ]; then
  cap=$(( HARD_STOP - $(now) - 120 )); [ "$cap" -gt 900 ] && cap=900
  say "START phase2 compile profile (cap ${cap}s)"
  timeout "$cap" python scripts/profile_phase2_compile.py \
    > logs/r4/phase2_compile.tmp 2> logs/r4/phase2_compile.log
  rc=$?
  say "DONE phase2 compile profile rc=$rc"
  if [ "$rc" -eq 0 ] && [ -s logs/r4/phase2_compile.tmp ]; then
    mv logs/r4/phase2_compile.tmp results/r4/phase2_compile.json
    commit_paths "r4 queue harvest: phase2 compile profile" \
      results/r4/phase2_compile.json
  else
    tail -c 4000 logs/r4/phase2_compile.log > results/r4/phase2_compile.err 2>/dev/null
    commit_paths "r4: phase2 compile profile FAILED (log tail)" \
      results/r4/phase2_compile.err || true
  fi
fi

# --- 2. fast-path production wall-clock probe -------------------------------
if [ ! -f results/r4/funnel_fast_prod_probe/metrics.jsonl ] && \
   [ $(( HARD_STOP - $(now) )) -gt 420 ]; then
  cap=$(( HARD_STOP - $(now) - 120 )); [ "$cap" -gt 700 ] && cap=700
  say "START funnel_fast_prod_probe (cap ${cap}s)"
  timeout "$cap" python scripts/main.py target=funnel solver=dis \
    train_steps=3000 eval_batch_size=2000 eval_init=False \
    eval_interval=3000 plot_results=False ckpt_interval=3000 \
    out_dir=logs/r4/funnel_fast_prod_probe \
    > logs/r4/funnel_fast_prod_probe.log 2>&1
  say "DONE funnel_fast_prod_probe rc=$?"
  harvest funnel_fast_prod_probe
fi

# --- 3. AlaDip reference eval set (chip ULA) --------------------------------
if [ ! -f data/aladip_eval.npy ] && \
   [ $(( HARD_STOP - $(now) )) -gt 300 ]; then
  cap=$(( HARD_STOP - $(now) - 60 ))
  say "START gen_aladip_eval (cap ${cap}s)"
  timeout "$cap" python scripts/gen_aladip_eval.py \
    > logs/r4/gen_aladip_eval.log 2>&1
  rc=$?
  say "DONE gen_aladip_eval rc=$rc"
  # rc gate + load sanity (advisor r4): the generator itself now writes
  # atomically (tmp + os.replace), so an existing file is whole; still,
  # only commit on a clean exit and a parseable array.
  if [ "$rc" -eq 0 ] && [ -f data/aladip_eval.npy ] && \
     python -c "import numpy as np; a=np.load('data/aladip_eval.npy', mmap_mode='r'); assert a.ndim==2 and a.shape[0]>1000" 2>/dev/null; then
    tail -c 4000 logs/r4/gen_aladip_eval.log > results/r4/gen_aladip_eval.log.tail
    commit_paths "r4: AlaDip reference eval set (ULA on chip)" \
      data/aladip_eval.npy results/r4/gen_aladip_eval.log.tail
  fi
fi

say "TAIL QUEUE DONE — chip idle for driver bench"
touch logs/r4/TAIL_DONE
