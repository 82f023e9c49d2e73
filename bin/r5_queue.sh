#!/bin/bash
# Round-5 chip queue — VERDICT r4 priority order.
#
# Differences vs bin/r4_queue.sh (same harvest/skip machinery):
#   * d=1 Pallas Sinkhorn staged probes run FIRST (VERDICT #4: "must
#     actually happen early in round 5"), followed by a mandatory health
#     probe before any grid cell. On success the interactive session
#     flips ops/sinkhorn_pallas.D1_HARDWARE_VALIDATED so the later dw
#     cells get the ~5 min pallas eval instead of ~24 min chunked XLA.
#   * gmm bridge collapse adjudication cell (solver=bridge_diff_init,
#     VERDICT #2) and the real AlaDip training cell (20k steps, budget
#     sized from the 5k smoke's measured 67 ms/step + 310 s compile,
#     VERDICT #3/#9).
#   * cox bf16 step-time probe (VERDICT #6) before the 60k cell.
#   * every >=20k-step cell sets ckpt_interval (r4 lesson).
#
# Usage: bash bin/r5_queue.sh [HARD_STOP]  (UTC 'YYYY-MM-DD HH:MM'; the
# chip must be idle for the driver's round-end bench). Safe to re-run:
# finished cells are skipped (consults logs/r4, results/r4, logs/r5,
# results/r5).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r5 results/r5

exec 9>logs/r5_queue.lock
flock -n 9 || { echo "[r5] another instance holds logs/r5_queue.lock"; exit 1; }
echo $$ > logs/r5_queue.pid

HARD_STOP=$(date -ud "${1:-$(date -ud '+3 hours' '+%Y-%m-%d %H:%M')}" +%s)

now() { date -u +%s; }
say() { echo "[r5] $* $(date -u +%H:%M:%S)"; }
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
  commit_paths "r5 queue harvest: $name" "results/r5/$name"
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
     [ -f "results/r5/$name/metrics.jsonl" ] || \
     [ -f "logs/r4/$name/metrics.jsonl" ] || \
     [ -f "results/r4/$name/metrics.jsonl" ] || \
     [ -f "logs/r3/$name/metrics.jsonl" ]; then
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
say "CHIP HEALTHY — starting round-5 cells"

# --- d=1 Pallas Sinkhorn staged probes FIRST (VERDICT #4) -------------------
# Quick-abort: a failed stage stops the sequence; NEVER loop-retry (a
# crashed Mosaic kernel wedges the chip; the r3 d=1 incident killed the
# relay). The padded launch shapes are identical to the validated d=2
# stages. A mandatory health probe follows before any grid cell.
if [ ! -f logs/r5/PALLAS_D1_OK ] && [ ! -f results/r5/PALLAS_D1_OK ]; then
  d1_ok=1
  for stage in single_d1 grid_d1 bench_d1; do
    say "d1 probe stage=$stage"
    timeout 600 python scripts/pallas_probe.py "$stage" \
      >> logs/r5/pallas_d1_probe.log 2>&1
    rc=$?
    say "d1 probe stage=$stage rc=$rc"
    if [ $rc -ne 0 ]; then d1_ok=0; break; fi
  done
  if [ "$d1_ok" -eq 1 ]; then
    touch logs/r5/PALLAS_D1_OK
    cp -f logs/r5/pallas_d1_probe.log results/r5/ 2>/dev/null
    touch results/r5/PALLAS_D1_OK
    commit_paths "r5: d=1 Pallas Sinkhorn staged probes PASSED on hardware" \
      results/r5/PALLAS_D1_OK results/r5/pallas_d1_probe.log
    say "ALL d1 stages OK — interactive session should flip sinkhorn_pallas.D1_HARDWARE_VALIDATED"
  else
    cp -f logs/r5/pallas_d1_probe.log results/r5/ 2>/dev/null
    commit_paths "r5: d=1 pallas probe FAILED (see log) — keeping gate off" \
      results/r5/pallas_d1_probe.log
    say "d1 probe FAILED — health probe before continuing"
  fi
  probe_until_healthy || { say "chip unhealthy after d1 probes — abandoned"; exit 1; }
fi

GRID_ARGS="eval_init=False eval_interval=60000"

# --- grid tail, judge-priority order (VERDICT #1) ---------------------------
run 1800 funnel_dis_lv_traj target=funnel solver=dis loss.method=lv_traj \
  loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS

# --- gmm bridge adjudication (VERDICT #2): the reference's own escape
# hatch for the diff-init collapse. Budget sized from the measured bridge
# 34 ms/step x 60k + compile + eval. ckpt_interval so a timeout keeps the
# trained state (r4 lesson). -------------------------------------------------
run 3000 gmm_bridge_diff_init target=gmm solver=bridge_diff_init \
  ckpt_interval=10000 $GRID_ARGS

# --- real AlaDip training cell (VERDICT #3): 20k steps, sized from the
# 5k smoke (67 ms/step @ batch 512 + 310 s compile + 905 s eval) -------------
run 3300 aladip_vacuum_dis_20k target=aladip_vacuum solver=dis \
  train_steps=20000 train_batch_size=512 eval_batch_size=4096 \
  ckpt_interval=5000 eval_init=False eval_interval=20000

# --- mw columns --------------------------------------------------------------
run 2400 mw_dis_kl_ito target=mw solver=dis loss.method=kl_ito $GRID_ARGS
run 2400 mw_dis_lv_traj target=mw solver=dis loss.method=lv_traj \
  loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS

# --- dw columns (d=1 Sinkhorn evals: ~5 min if the pallas gate flipped,
# ~24 min on chunked XLA — budget for the slow path to be safe) ---------------
run 3000 dw_shift_dis_kl_ito target=dw_shift solver=dis loss.method=kl_ito $GRID_ARGS
run 3000 dw_shift_dis_lv_traj target=dw_shift solver=dis loss.method=lv_traj \
  loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS

# --- cox bf16 step-time probe (VERDICT #6): measure the matmul-precision
# delta on the one genuinely MXU-bound workload before the 60k cell.
# 200 steps each, tiny eval; results land in the harvested metrics. ----------
run 900 cox_bf16_probe_f32 target=cox +target.use_whitened=True solver=dis \
  train_steps=200 train_batch_size=1024 eval_batch_size=1024 \
  eval_init=False eval_interval=200 plot_results=False
run 900 cox_bf16_probe_bf16 target=cox +target.use_whitened=True solver=dis \
  train_steps=200 train_batch_size=1024 eval_batch_size=1024 \
  matmul_precision=bfloat16 \
  eval_init=False eval_interval=200 plot_results=False

# --- cox 60k through the standard pipeline (VERDICT #6; ~2h measured in
# r2). Runs BEFORE the stragglers (reordered mid-round-5: with the r5
# relaunch at 05:17 the original tail order would hit this gate with
# <9000s left and silently drop the judge's explicit item #6; rings/img/
# rosenbrock are the lower-priority trade). ckpt_interval keeps the
# trained state on a timeout; the eval-only resume recipe recovers it. -------
if [ $(( HARD_STOP - $(now) )) -gt 8700 ]; then
  run 8400 cox_whitened_60k target=cox +target.use_whitened=True solver=dis \
    train_steps=60000 train_batch_size=1024 eval_batch_size=100000 \
    ckpt_interval=10000 eval_init=False eval_interval=20000
fi

# --- stragglers --------------------------------------------------------------
run 2400 mw_50d_dis target=mw_50d solver=dis ckpt_interval=20000 $GRID_ARGS
run 1800 rings_dis_lv target=rings solver=dis $GRID_ARGS
run 1800 img_dis_lv target=img solver=dis train_steps=10000 \
  eval_init=False eval_interval=10000

# --- rosenbrock 60k ----------------------------------------------------------
if [ $(( HARD_STOP - $(now) )) -gt 4200 ]; then
  run 3600 rosenbrock_dis_60k target=rosenbrock solver=dis \
    ckpt_interval=20000 $GRID_ARGS
fi

# --- nice_smooth (~3h) only if a miracle of time remains --------------------
if [ $(( HARD_STOP - $(now) )) -gt 12600 ]; then
  if [ ! -f logs/r5/NICE_SMOOTH_VALIDATED ] && [ ! -f logs/r4/NICE_SMOOTH_VALIDATED ] && \
     [ ! -f logs/r3/NICE_SMOOTH_VALIDATED ] && [ ! -f results/r4/NICE_SMOOTH_VALIDATED ]; then
    say "START validate_nice_smooth (marker regen)"
    timeout 900 python bin/validate_nice_smooth.py \
      > logs/r5/validate_nice_smooth.log 2>&1
    say "DONE validate_nice_smooth rc=$?"
    [ -f logs/r4/NICE_SMOOTH_VALIDATED ] || [ -f logs/r5/NICE_SMOOTH_VALIDATED ] || true
  fi
  if [ -f logs/r5/NICE_SMOOTH_VALIDATED ] || [ -f logs/r4/NICE_SMOOTH_VALIDATED ] || \
     [ -f logs/r3/NICE_SMOOTH_VALIDATED ] || [ -f results/r4/NICE_SMOOTH_VALIDATED ]; then
    run 10800 nice_smooth_dis_lv target=nice_smooth solver=dis \
      ckpt_interval=20000 eval_init=False eval_interval=20000
  fi
fi

# --- warm the compile cache for the driver's round-end bench ----------------
if [ $(( HARD_STOP - $(now) )) -gt 600 ] && relay_up; then
  say "bench warm-up for the driver capture"
  timeout 900 python bench.py > logs/r5/BENCH_SANITY.tmp 2> logs/r5/bench_sanity.log \
    && mv logs/r5/BENCH_SANITY.tmp logs/r5/BENCH_SANITY.json
  say "bench warm rc=$? $(tail -1 logs/r5/BENCH_SANITY.json 2>/dev/null | head -c 200)"
  if [ -s logs/r5/BENCH_SANITY.json ]; then
    cp -f logs/r5/BENCH_SANITY.json results/r5/
    commit_paths "r5 queue harvest: bench sanity" results/r5/BENCH_SANITY.json
  fi
fi

say "QUEUE COMPLETE"
