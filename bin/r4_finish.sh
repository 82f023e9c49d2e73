#!/bin/bash
# Round-4 queue takeover (14:15 UTC Aug-18). The original bin/r4_queue.sh
# sized the gmm solver-tail budgets at 1800s, but solver=bridge trains TWO
# control nets (~34 ms/step => ~2040s of training alone) and ckpt_interval
# defaults to train_steps, so the gmm_bridge_lv timeout at step 46750 left
# NO checkpoint and NO eval row. This script finishes the round window
# (HARD_STOP 15:45, chip idle for the driver's bench) with:
#   - correct budgets + ckpt_interval=10000 so any timeout leaves a ckpt,
#   - a full gmm_bridge_lv rerun (fresh out_dir wipe; the partial harvest
#     is preserved in git history),
#   - a hard remaining-time guard on EVERY chip launch (the original
#     script's gen_aladip_eval block had none and could have run into the
#     driver's bench window).
# Usage: bash bin/r4_finish.sh 'YYYY-MM-DD HH:MM' [WAIT_PID [WAIT_NAME]]
#   WAIT_PID: in-flight orphaned cell process to wait for + harvest as
#   WAIT_NAME before starting.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r4 results/r4

exec 9>logs/r4_finish.lock
flock -n 9 || { echo "[r4f] another instance holds logs/r4_finish.lock"; exit 1; }
echo $$ > logs/r4_finish.pid

HARD_STOP=$(date -ud "${1:?HARD_STOP required}" +%s)
WAIT_PID="${2:-}"
WAIT_NAME="${3:-gmm_dis_subtraj}"

now() { date -u +%s; }
say() { echo "[r4f] $* $(date -u +%H:%M:%S)"; }
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
  # A clean exit means the final evaluate() ran — mark it so re-runs skip.
  [ "$rc" -eq 0 ] && touch "logs/r4/$name/EVAL_DONE" && \
    touch "results/r4/$name/EVAL_DONE" 2>/dev/null
  harvest "$name"
  [ "$rc" -eq 0 ] && [ -f "logs/r4/$name/EVAL_DONE" ] && \
    { mkdir -p "results/r4/$name"; touch "results/r4/$name/EVAL_DONE"; }
}

if [ -n "$WAIT_PID" ]; then
  say "waiting for in-flight cell pid $WAIT_PID ($WAIT_NAME)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  say "in-flight cell exited"
  sleep 3
  # rc unknown (orphan); infer eval completion from the log.
  if grep -q "eval/" "logs/r4/$WAIT_NAME/metrics.jsonl" 2>/dev/null; then
    touch "logs/r4/$WAIT_NAME/EVAL_DONE"
  fi
  harvest "$WAIT_NAME"
fi

relay_up || say "WARNING: relay port closed at takeover"

GRID_ARGS="eval_init=False eval_interval=60000 ckpt_interval=10000"

# Full bridge rerun: ~2040s train + ~240s eval + startup.
rm -rf logs/r4/gmm_bridge_lv
run 2520 gmm_bridge_lv target=gmm solver=bridge $GRID_ARGS

# Single-net cells ~13 ms/step => ~810s train + eval.
run 1500 gmm_dds_euler     target=gmm    solver=dds_euler $GRID_ARGS
run 1500 funnel_dis_kl_ito target=funnel solver=dis loss.method=kl_ito $GRID_ARGS

# Fast-path lv cells (~7 ms/step) — only if time remains.
run 1200 gmm_dis_lv_seed3   target=gmm    solver=dis seed=3 $GRID_ARGS
run 1200 funnel_dis_lv_traj target=funnel solver=dis loss.method=lv_traj \
  loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS

touch logs/r4/FINISH_DONE
say "ALL DONE — chip idle"
