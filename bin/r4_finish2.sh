#!/bin/bash
# Second round-4 takeover (14:35 UTC): a background pytest run contended
# the 1-core host for the first ~13 min of the gmm_bridge_lv rerun
# (44 ms/step vs 34 clean), pushing its finish past the 2520s timeout —
# and the final checkpoint is only written AFTER the closing evaluate(),
# so a mid-eval timeout loses the trained params. The bridge python was
# detached from its timeout wrapper (SIGKILL the wrapper only) and runs
# unbounded; this script waits for it, harvests, then runs the remaining
# single-net cells with the same hard 15:45 guard.
# Usage: bash bin/r4_finish2.sh 'YYYY-MM-DD HH:MM' WAIT_PID
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r4 results/r4

exec 9>logs/r4_finish2.lock
flock -n 9 || { echo "[r4f2] another instance holds the lock"; exit 1; }
echo $$ > logs/r4_finish2.pid

HARD_STOP=$(date -ud "${1:?HARD_STOP required}" +%s)
WAIT_PID="${2:?WAIT_PID required}"

now() { date -u +%s; }
say() { echo "[r4f2] $* $(date -u +%H:%M:%S)"; }

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
  local name="$1"
  [ -d "logs/r4/$name" ] || return 0
  mkdir -p "results/r4/$name"
  cp -f "logs/r4/$name/metrics.jsonl" "results/r4/$name/" 2>/dev/null
  local f
  for f in "logs/r4/$name"/*.yaml; do
    [ -f "$f" ] && cp -f "$f" "results/r4/$name/"
  done
  [ -f "logs/r4/$name.log" ] && \
    tail -c 20000 "logs/r4/$name.log" > "results/r4/$name/run.log.tail"
  commit_paths "r4 queue harvest: $name" "results/r4/$name"
}

run() {
  local cap="$1"; shift
  local name="$1"; shift
  if [ -f "logs/r4/$name/EVAL_DONE" ] || [ -f "results/r4/$name/EVAL_DONE" ]; then
    say "SKIP $name (eval done)"; return
  fi
  local remaining=$(( HARD_STOP - $(now) ))
  if [ "$remaining" -lt 600 ]; then say "HARD STOP — skip $name"; return; fi
  [ "$cap" -lt "$remaining" ] && remaining=$cap
  say "START $name (budget ${remaining}s): $*"
  timeout "$remaining" python scripts/main.py "$@" \
    out_dir="logs/r4/$name" > "logs/r4/$name.log" 2>&1
  local rc=$?
  say "DONE $name rc=$rc"
  if [ "$rc" -eq 0 ]; then
    touch "logs/r4/$name/EVAL_DONE"
    mkdir -p "results/r4/$name"; touch "results/r4/$name/EVAL_DONE"
  fi
  harvest "$name"
}

say "waiting for unbounded gmm_bridge_lv pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
say "gmm_bridge_lv exited"
sleep 3
if grep -q "eval/" logs/r4/gmm_bridge_lv/metrics.jsonl 2>/dev/null; then
  touch logs/r4/gmm_bridge_lv/EVAL_DONE
  mkdir -p results/r4/gmm_bridge_lv; touch results/r4/gmm_bridge_lv/EVAL_DONE
fi
harvest gmm_bridge_lv

GRID_ARGS="eval_init=False eval_interval=60000 ckpt_interval=10000"

run 1500 gmm_dds_euler     target=gmm    solver=dds_euler $GRID_ARGS
run 1500 funnel_dis_kl_ito target=funnel solver=dis loss.method=kl_ito $GRID_ARGS
run 1200 gmm_dis_lv_seed3   target=gmm    solver=dis seed=3 $GRID_ARGS
run 1200 funnel_dis_lv_traj target=funnel solver=dis loss.method=lv_traj \
  loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS

touch logs/r4/FINISH_DONE
say "ALL DONE — chip idle"
