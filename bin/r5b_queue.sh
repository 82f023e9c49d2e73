#!/bin/bash
# Round-5 EXTENDED-window queue (session 5, started 15:25 UTC Aug-19 with
# a fresh ~12h budget). The main r5 queue + tail2 completed everything
# they gated; this queue fills the extension with the remaining depth
# items, in order:
#   1. cox_highest_probe    — matmul_precision=highest 200-step step-time
#                             probe; closes the dangling "(probe below)"
#                             in RESULTS.md's cox-precision subsection.
#   2. validate_nice_smooth — CPU marker regen with a budget sized from
#                             the observed 2.7-3.2 s/step (the 900 s
#                             attempt died at step 200/300; 3600 s here).
#                             Runs while the chip is idle; chip cells
#                             never overlap it (1-core host, r4 lesson).
#   3. nice_smooth_dis_60k  — paper-budget NICE row to supersede the
#                             degenerate nice_dis_lv (score-guided flow
#                             ~165 ms/step => 9900 s train; ckpt every
#                             10k so a timeout is resumable).
#   4. aladip_vacuum_dis_60k — paper-budget flagship molecular cell
#                             (measured 67 ms/step @ batch 512 => 4020 s
#                             + 310 s compile + eval).
#   5. gmm_bridge_diff_init_seed2 — replicate of the VERDICT #2
#                             adjudication cell (guards against seed luck
#                             on the 0.087 logZ-IS result).
#   6. cox_unwhitened_60k   — optional straggler: the r1 unwhitened row
#                             was 20k steps (rel 0.19); 60k through the
#                             current pipeline, time permitting.
#   7. bench.py warm        — final sanity capture, then chip idle for
#                             the driver's round-end bench.
# Same harvest/skip machinery as bin/r5_queue.sh; shares its lock so a
# stale instance can never double-drive the chip.
#
# Usage: bash bin/r5b_queue.sh [HARD_STOP]  (UTC 'YYYY-MM-DD HH:MM')
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r5 results/r5

exec 9>logs/r5_queue.lock
flock -n 9 || { echo "[r5b] another instance holds logs/r5_queue.lock"; exit 1; }
echo $$ > logs/r5_queue.pid

HARD_STOP=$(date -ud "${1:-2026-08-20 01:45}" +%s)

now() { date -u +%s; }
say() { echo "[r5b] $* $(date -u +%H:%M:%S)"; }
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
  commit_paths "r5b queue harvest: $name" "results/r5/$name"
}

probe_until_healthy() {
  local n=0
  while [ $(( HARD_STOP - $(now) )) -gt 900 ]; do
    if ! relay_up; then sleep 120; continue; fi
    n=$((n+1))
    say "relay port open — PROBE $n start"
    rm -rf logs/r5/probe
    timeout 360 python scripts/main.py target=funnel solver=dis \
      train_steps=50 train_batch_size=512 eval_batch_size=512 \
      eval_init=False plot_results=False out_dir=logs/r5/probe \
      > logs/r5/probe.log 2>&1
    local rc=$?
    say "PROBE $n rc=$rc"
    [ "$rc" -eq 0 ] && return 0
    sleep 900
  done
  return 1
}

WEDGED=0
run() {
  [ "$WEDGED" -gt 2 ] && return
  local cap="$1"; shift
  local name="$1"; shift
  if [ -f "logs/r5/$name/metrics.jsonl" ] || \
     [ -f "results/r5/$name/metrics.jsonl" ]; then
    say "SKIP $name (exists)"; return
  fi
  local remaining=$(( HARD_STOP - $(now) ))
  if [ "$remaining" -lt 900 ]; then say "HARD STOP — skip $name"; return; fi
  [ "$cap" -lt "$remaining" ] && remaining=$cap
  say "START $name (budget ${remaining}s): $*"
  timeout "$remaining" python scripts/main.py "$@" \
    out_dir="logs/r5/$name" > "logs/r5/$name.log" 2>&1
  local rc=$?
  say "DONE $name rc=$rc"
  harvest "$name" "$rc"
  if [ "$rc" -eq 124 ]; then
    say "rc=124 — immediate health probe"
    if ! probe_until_healthy; then
      WEDGED=$((WEDGED+1))
      say "probe failed after rc=124 (count $WEDGED)"
    fi
  fi
}

probe_until_healthy || { say "never healthy — abandoned"; exit 1; }
say "CHIP HEALTHY — starting r5b cells"

# 1. cox highest-precision probe (chip alone — clean step timing).
run 1500 cox_highest_probe target=cox +target.use_whitened=True solver=dis \
  train_steps=200 train_batch_size=1024 eval_batch_size=1024 \
  matmul_precision=highest \
  eval_init=False eval_interval=200 plot_results=False

# 2. nice_smooth validation marker (CPU; chip idle while it runs).
if [ ! -f logs/r5/NICE_SMOOTH_VALIDATED ] && \
   [ ! -f logs/r4/NICE_SMOOTH_VALIDATED ] && \
   [ ! -f results/r4/NICE_SMOOTH_VALIDATED ] && \
   [ $(( HARD_STOP - $(now) )) -gt 15000 ]; then
  say "START validate_nice_smooth (marker regen, 3600s budget)"
  timeout 3600 nice -n 5 python bin/validate_nice_smooth.py \
    > logs/r5/validate_nice_smooth2.log 2>&1
  say "DONE validate_nice_smooth rc=$?"
fi

# 3. nice_smooth paper cell. Measured on-chip 16:09 UTC: 0.190 s/step
# (not the r3 165 ms estimate) + ~700 s first-step compile of the
# score-guided flow-gradient graph => 60k x 0.19 + 700 + eval ~= 12.7 ks.
if [ -f logs/r5/NICE_SMOOTH_VALIDATED ] || [ -f logs/r4/NICE_SMOOTH_VALIDATED ] \
   || [ -f results/r4/NICE_SMOOTH_VALIDATED ]; then
  run 13800 nice_smooth_dis_60k target=nice_smooth solver=dis \
    train_steps=60000 train_batch_size=2048 \
    ckpt_interval=10000 eval_init=False eval_interval=60000
else
  say "SKIP nice_smooth_dis_60k (no validation marker)"
fi

# 4. AlaDip paper-budget cell (67 ms/step x 60k = 4020 s + 310 s compile).
run 5700 aladip_vacuum_dis_60k target=aladip_vacuum solver=dis \
  train_steps=60000 train_batch_size=512 eval_batch_size=4096 \
  ckpt_interval=10000 eval_init=False eval_interval=60000

# 5. bridge_diff_init seed replicate (34 ms/step x 60k = 2040 s + eval).
run 3300 gmm_bridge_diff_init_seed2 target=gmm solver=bridge_diff_init \
  seed=2 ckpt_interval=20000 eval_init=False eval_interval=60000

# 6. Optional: cox unwhitened at the full 60k budget (r1 row was 20k).
if [ $(( HARD_STOP - $(now) )) -gt 9000 ]; then
  run 8400 cox_unwhitened_60k target=cox solver=dis \
    train_steps=60000 train_batch_size=1024 eval_batch_size=100000 \
    ckpt_interval=10000 eval_init=False eval_interval=60000
fi

# 7. Final bench warm capture.
if [ $(( HARD_STOP - $(now) )) -gt 900 ]; then
  say "BENCH warm capture"
  timeout 800 python bench.py > logs/r5/bench_final.json 2>logs/r5/bench_final.log
  rc=$?
  say "BENCH rc=$rc"
  if [ "$rc" -eq 0 ] && [ -s logs/r5/bench_final.json ]; then
    cp -f logs/r5/bench_final.json results/r5/BENCH_FINAL.json
    commit_paths "r5b: final bench warm capture" results/r5/BENCH_FINAL.json
  fi
fi

say "R5B QUEUE COMPLETE — chip idle for the driver bench"
