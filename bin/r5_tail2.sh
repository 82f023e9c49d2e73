#!/bin/bash
# Round-5 tail v2 (supersedes bin/r5_tail.sh, whose waiting instance was
# killed at 09:50 UTC): waits for bin/r5_queue.sh to release its lock
# (flock BLOCKS — no polling), then fills the remaining chip window, in
# order:
#   1. cox_whitened_60k RESUME — VERDICT #6. The queue's first attempt
#      died at the step-20000 interim eval with a 512 GB pregen-noise
#      HBM OOM (fixed in commit 036ee84: simulate() now falls back to
#      in-loop noise above a 4 GiB ceiling). Relaunch with the SAME
#      out_dir restores ckpt010000 and trains 10k->60k (50k x 0.0801 s
#      measured = 4005 s) + final 800-step eval at batch 100k (~1200 s
#      extrapolated from the bf16 probe's 11.8 s warm eval at batch
#      1024). eval_interval=60000 skips the interim evals;
#      plot_results=False avoids a 2.6 GB (801,512,1600) trajectory
#      device->host pull over the relay.
#   2. aladip_vacuum_dis_60k — paper-budget flagship molecular cell
#      (time permitting; the 20k cell already landed VERDICT #3).
#   3. nice_smooth_dis_20k — reduced-budget nice_smooth row.
# The chip is left idle by HARD_STOP for the driver's round-end bench.
#
# Usage: bash bin/r5_tail2.sh [HARD_STOP]   (UTC 'YYYY-MM-DD HH:MM')
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r5 results/r5

HARD_STOP=$(date -ud "${1:-2026-08-19 14:15}" +%s)

now() { date -u +%s; }
say() { echo "[r5tail2] $* $(date -u +%H:%M:%S)"; }
relay_up() { timeout 2 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; }

exec 8>logs/r5_tail.lock
flock -n 8 || { say "another tail holds logs/r5_tail.lock"; exit 1; }
echo $$ > logs/r5_tail.pid

say "waiting for r5_queue lock release"
exec 9>logs/r5_queue.lock
flock 9 || { say "flock on queue lock failed"; exit 1; }
say "queue lock acquired — main queue is done"

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
  local name="$1" rc="${2:-0}"
  [ -d "logs/r5/$name" ] || return 0
  if [ ! -s "logs/r5/$name/metrics.jsonl" ]; then
    say "harvest $name: no metrics.jsonl (rc=$rc) — not committing"
    return 0
  fi
  mkdir -p "results/r5/$name"
  cp -f "logs/r5/$name/metrics.jsonl" "results/r5/$name/"
  local f
  for f in "logs/r5/$name"/*.yaml; do
    [ -f "$f" ] && cp -f "$f" "results/r5/$name/"
  done
  if [ -d "logs/r5/$name/plots" ]; then
    mkdir -p "results/r5/$name/plots"
    cp -f "logs/r5/$name/plots/"*.png "results/r5/$name/plots/" 2>/dev/null
  fi
  [ -f "logs/r5/$name.log" ] && \
    tail -c 20000 "logs/r5/$name.log" > "results/r5/$name/run.log.tail"
  commit_paths "r5 tail harvest: $name" "results/r5/$name"
}

# --- 1. cox resume (gate: final ckpt written only AFTER the closing
# evaluate(), so its existence == completed cell) -----------------------------
if [ -f logs/r5/cox_whitened_60k/ckpt/ckpt_final.pkl ]; then
  say "SKIP cox_whitened_60k resume (ckpt_final exists)"
else
  remaining=$(( HARD_STOP - $(now) ))
  if [ "$remaining" -lt 5400 ]; then
    say "SKIP cox_whitened_60k resume (need 5400s, have ${remaining}s)"
  elif ! relay_up; then
    say "SKIP cox_whitened_60k resume (relay down)"
  else
    [ "$remaining" -gt 7000 ] && remaining=7000
    say "START cox_whitened_60k RESUME (budget ${remaining}s)"
    timeout "$remaining" python scripts/main.py \
      target=cox +target.use_whitened=True solver=dis \
      train_steps=60000 train_batch_size=1024 eval_batch_size=100000 \
      ckpt_interval=10000 eval_init=False eval_interval=60000 \
      plot_results=False out_dir=logs/r5/cox_whitened_60k \
      > logs/r5/cox_whitened_60k_resume.log 2>&1
    rc=$?
    say "DONE cox_whitened_60k resume rc=$rc"
    cp -f logs/r5/cox_whitened_60k_resume.log logs/r5/cox_whitened_60k.log
    harvest cox_whitened_60k "$rc"
  fi
fi

# gate <min_remaining_s> <cap_s> <name> <args...>
gate() {
  local need="$1" cap="$2" name="$3"; shift 3
  if [ -f "logs/r5/$name/metrics.jsonl" ] || \
     [ -f "results/r5/$name/metrics.jsonl" ] || \
     [ -f "logs/r4/$name/metrics.jsonl" ] || \
     [ -f "results/r4/$name/metrics.jsonl" ]; then
    say "SKIP $name (exists)"; return 0
  fi
  local remaining=$(( HARD_STOP - $(now) ))
  if [ "$remaining" -lt "$need" ]; then
    say "SKIP $name (need ${need}s, have ${remaining}s)"; return 0
  fi
  relay_up || { say "SKIP $name (relay down)"; return 0; }
  [ "$cap" -lt "$remaining" ] && remaining=$cap
  say "START $name (budget ${remaining}s): $*"
  timeout "$remaining" python scripts/main.py "$@" \
    out_dir="logs/r5/$name" > "logs/r5/$name.log" 2>&1
  local rc=$?
  say "DONE $name rc=$rc"
  harvest "$name" "$rc"
}

gate 6000 5700 aladip_vacuum_dis_60k target=aladip_vacuum solver=dis \
  train_steps=60000 train_batch_size=512 eval_batch_size=4096 \
  ckpt_interval=10000 eval_init=False eval_interval=60000

if [ $(( HARD_STOP - $(now) )) -gt 4800 ]; then
  if [ ! -f logs/r5/NICE_SMOOTH_VALIDATED ] && [ ! -f logs/r4/NICE_SMOOTH_VALIDATED ] && \
     [ ! -f results/r4/NICE_SMOOTH_VALIDATED ]; then
    say "START validate_nice_smooth (marker regen)"
    timeout 900 python bin/validate_nice_smooth.py \
      > logs/r5/validate_nice_smooth.log 2>&1
    say "DONE validate_nice_smooth rc=$?"
  fi
  if [ -f logs/r5/NICE_SMOOTH_VALIDATED ] || [ -f logs/r4/NICE_SMOOTH_VALIDATED ] || \
     [ -f results/r4/NICE_SMOOTH_VALIDATED ]; then
    gate 4500 4400 nice_smooth_dis_20k target=nice_smooth solver=dis \
      train_steps=20000 train_batch_size=2048 \
      ckpt_interval=5000 eval_init=False eval_interval=20000
  fi
fi

say "TAIL COMPLETE — chip idle for the driver bench"
