#!/bin/bash
# Round-4 chip queue — everything paper-scale that the round-3 relay
# outage blocked (see CLAUDE.md round-3 learnings for the dead-relay
# diagnosis and probe protocol).
#
# Rewritten 12:30 UTC Aug-18 after the SECOND VM reboot of the day wiped
# logs/ again: every completed cell is now HARVESTED into the tracked
# results/r4/ tree and git-committed immediately, so chip work survives
# reboots; the skip check consults results/r4 too. Cells are reordered
# for a ~3 h window (judge priority first); multi-hour cells (cox, nice)
# only start when their FULL budget fits; the d=1 pallas probes need a
# manual opt-in flag (touch logs/r4/RUN_D1) because a relay kill before
# the driver's round-end bench would null BENCH_r04 again.
#
# Usage: bash bin/r4_queue.sh [HARD_STOP]   (HARD_STOP = 'YYYY-MM-DD HH:MM'
# UTC when the chip must be idle for the driver's bench run; default
# 3 h after launch). Safe to re-run: finished cells are skipped.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r4 results/r4

# Single-instance lock.
exec 9>logs/r4_queue.lock
flock -n 9 || { echo "[r4] another instance holds logs/r4_queue.lock"; exit 1; }
echo $$ > logs/r4_queue.pid

HARD_STOP=$(date -ud "${1:-$(date -ud '+3 hours' '+%Y-%m-%d %H:%M')}" +%s)

now() { date -u +%s; }
say() { echo "[r4] $* $(date -u +%H:%M:%S)"; }
relay_up() { timeout 2 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; }

# Copy a cell's durable artifacts into the tracked results/ tree and
# commit ONLY those paths (pathspec commit => never sweeps up whatever
# the interactive session has staged). Retries around index.lock races.
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

probe_until_healthy() {
  local n=0
  while [ $(( HARD_STOP - $(now) )) -gt 900 ]; do
    if ! relay_up; then sleep 120; continue; fi
    n=$((n+1))
    say "relay port open — PROBE $n start"
    rm -rf logs/r4/probe
    timeout 360 python scripts/main.py target=funnel solver=dis \
      train_steps=50 train_batch_size=512 eval_batch_size=512 \
      eval_init=False plot_results=False out_dir=logs/r4/probe \
      > logs/r4/probe.log 2>&1
    local rc=$?
    say "PROBE $n rc=$rc"
    [ "$rc" -eq 0 ] && return 0
    sleep 900   # port open but probe failed: genuine chip trouble
  done
  return 1
}

WEDGED=0
run() {
  [ "$WEDGED" -gt 2 ] && return
  local cap="$1"; shift
  local name="$1"; shift
  if [ -f "logs/r4/$name/metrics.jsonl" ] || \
     [ -f "results/r4/$name/metrics.jsonl" ] || \
     [ -f "logs/r3/$name/metrics.jsonl" ]; then
    say "SKIP $name (exists)"; return
  fi
  local remaining=$(( HARD_STOP - $(now) ))
  if [ "$remaining" -lt 900 ]; then say "HARD STOP — skip $name"; return; fi
  [ "$cap" -lt "$remaining" ] && remaining=$cap
  say "START $name (budget ${remaining}s): $*"
  timeout "$remaining" python scripts/main.py "$@" \
    out_dir="logs/r4/$name" > "logs/r4/$name.log" 2>&1
  local rc=$?
  say "DONE $name rc=$rc"
  harvest "$name"
  if [ "$rc" -eq 124 ]; then
    # Could be a mere budget overrun, not a wedge: probe immediately; only
    # back off if the probe itself fails.
    say "rc=124 — immediate health probe"
    if ! probe_until_healthy; then
      WEDGED=$((WEDGED+1))
      say "probe failed after rc=124 (count $WEDGED)"
    fi
  fi
}

probe_until_healthy || { say "never healthy — abandoned"; exit 1; }
say "CHIP HEALTHY — starting cells"

# --- bench sanity first (~3 min): confirm the driver-facing number is
# capturable before spending the chip budget on cells (VERDICT r3 #2) ----
if [ ! -f logs/r4/BENCH_SANITY.json ] && [ ! -f results/r4/BENCH_SANITY.json ]; then
  timeout 900 python bench.py > logs/r4/BENCH_SANITY.tmp 2> logs/r4/bench_sanity.log \
    && mv logs/r4/BENCH_SANITY.tmp logs/r4/BENCH_SANITY.json
  say "bench sanity rc=$? $(tail -1 logs/r4/BENCH_SANITY.json 2>/dev/null | head -c 200)"
  if [ -f logs/r4/BENCH_SANITY.json ]; then
    cp -f logs/r4/BENCH_SANITY.json results/r4/
    commit_paths "r4 queue harvest: bench sanity" results/r4/BENCH_SANITY.json
  fi
fi

GRID_ARGS="eval_init=False eval_interval=60000"

# --- two-phase fast-path cell (now also the production default, flipped
# in commit fc52522 after the 08:46-12:20 session's REEVAL — that
# checkpoint died with the 12:20 reboot, so retrain to regenerate the
# GRID_TABLE row's metrics, then re-eval the same ckpt through the
# standard path for the A/B row) -----------------------------------------
run 1800 funnel_dis_lv_twophase target=funnel solver=dis \
  +loss.two_phase=True +loss.noise_pregen=True +loss.scan_unroll=8 \
  $GRID_ARGS
if [ -f logs/r4/funnel_dis_lv_twophase/ckpt/ckpt_final.pkl ] && \
   [ ! -f logs/r4/funnel_dis_lv_twophase/REEVAL_DONE ]; then
  say "START twophase_reeval (standard path, same ckpt)"
  timeout 1200 python scripts/main.py target=funnel solver=dis \
    +loss.two_phase=False +loss.noise_pregen=False $GRID_ARGS \
    out_dir=logs/r4/funnel_dis_lv_twophase \
    > logs/r4/funnel_dis_lv_twophase.reeval.log 2>&1 \
    && touch logs/r4/funnel_dis_lv_twophase/REEVAL_DONE
  say "DONE twophase_reeval rc=$?"
  harvest funnel_dis_lv_twophase
fi

# --- funnel seed-3 retrain under the max_rnd-filter convention (fills the
# inf cell in GRID_TABLE; VERDICT r3 #8) ----------------------------------
run 1800 funnel_dis_lv_seed3 target=funnel solver=dis seed=3 $GRID_ARGS

# --- VERDICT-r2 item 2: solver-family tail at paper scale ----------------
run 1800 gmm_bridge_lv    target=gmm solver=bridge      $GRID_ARGS
run 1800 gmm_dis_subtraj  target=gmm solver=dis_subtraj $GRID_ARGS
run 1800 gmm_dds_euler    target=gmm solver=dds_euler   $GRID_ARGS

# --- kl_ito estimator column (funnel first; dw/mw later — dw eval ~24 min
# on the d=1 XLA Sinkhorn path) -------------------------------------------
run 1800 funnel_dis_kl_ito target=funnel solver=dis loss.method=kl_ito $GRID_ARGS

# --- gmm 3rd seed ----------------------------------------------------------
run 1800 gmm_dis_lv_seed3 target=gmm solver=dis seed=3 $GRID_ARGS

# --- JAX-native AlaDip (VERDICT r4 #6; CPU-validated, tests green) ----------
if [ ! -f data/aladip_eval.npy ]; then
  say "START gen_aladip_eval"
  timeout 1500 python scripts/gen_aladip_eval.py \
    > logs/r4/gen_aladip_eval.log 2>&1
  say "DONE gen_aladip_eval rc=$?"
  [ -f data/aladip_eval.npy ] && \
    commit_paths "r4: AlaDip reference eval set (ULA on chip)" data/aladip_eval.npy
fi
run 2100 aladip_vacuum_dis target=aladip_vacuum solver=dis \
  train_steps=5000 train_batch_size=512 eval_batch_size=4096 \
  eval_init=False eval_interval=5000

# --- lv_traj column (funnel first) -----------------------------------------
run 1800 funnel_dis_lv_traj target=funnel solver=dis loss.method=lv_traj \
  loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS

# --- phase-2 compile root-cause data (VERDICT r4 #5) -------------------------
if [ -f scripts/profile_phase2_compile.py ] && \
   [ ! -f logs/r4/phase2_compile.json ] && \
   [ ! -f results/r4/phase2_compile.json ]; then
  say "START phase2 compile profile"
  timeout 1500 python scripts/profile_phase2_compile.py \
    > logs/r4/phase2_compile.tmp 2> logs/r4/phase2_compile.log \
    && mv logs/r4/phase2_compile.tmp logs/r4/phase2_compile.json
  say "DONE phase2 compile profile rc=$?"
  if [ -f logs/r4/phase2_compile.json ]; then
    cp -f logs/r4/phase2_compile.json results/r4/
    commit_paths "r4 queue harvest: phase2 compile profile" results/r4/phase2_compile.json
  fi
fi

# --- production wall-clock probe of the fast path at current defaults ----
run 1200 funnel_fast_prod_probe target=funnel solver=dis \
  train_steps=3000 eval_batch_size=2000 eval_init=False \
  eval_interval=3000 plot_results=False

# --- mw columns --------------------------------------------------------------
run 2400 mw_dis_kl_ito target=mw solver=dis loss.method=kl_ito $GRID_ARGS
run 2400 mw_dis_lv_traj target=mw solver=dis loss.method=lv_traj \
  loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS

# --- dw columns (expensive evals: d=1 Sinkhorn on chunked XLA) ---------------
run 3000 dw_shift_dis_kl_ito target=dw_shift solver=dis loss.method=kl_ito $GRID_ARGS
run 3000 dw_shift_dis_lv_traj target=dw_shift solver=dis loss.method=lv_traj \
  loss.traj_per_sample=8 train_batch_size=256 $GRID_ARGS

# --- stragglers (VERDICT-r2 item 8) ----------------------------------------
run 2400 mw_50d_dis target=mw_50d solver=dis $GRID_ARGS
run 1800 rings_dis_lv target=rings solver=dis $GRID_ARGS
run 1800 img_dis_lv target=img solver=dis train_steps=10000 \
  eval_init=False eval_interval=10000
if [ $(( HARD_STOP - $(now) )) -gt 4200 ]; then
  run 3600 rosenbrock_dis_60k target=rosenbrock solver=dis $GRID_ARGS
fi

# --- multi-hour cells: only when the FULL budget fits (a timeout here is
# wasted chip time AND trips the wedge heuristic) ----------------------------
if [ $(( HARD_STOP - $(now) )) -gt 9000 ]; then
  run 8400 cox_whitened_60k target=cox +target.use_whitened=True solver=dis \
    train_steps=60000 train_batch_size=1024 eval_batch_size=100000 \
    eval_init=False eval_interval=20000
fi
if [ $(( HARD_STOP - $(now) )) -gt 12600 ] && \
   [ ! -f logs/r4/NICE_SMOOTH_VALIDATED ] && [ ! -f logs/r3/NICE_SMOOTH_VALIDATED ] && \
   [ ! -f results/r4/NICE_SMOOTH_VALIDATED ]; then
  # The marker lives in reboot-wiped logs/; regenerate it (CPU-only,
  # ~3-5 min, writes logs/r4/NICE_SMOOTH_VALIDATED itself on ALL OK).
  say "START validate_nice_smooth (marker regen)"
  timeout 900 python bin/validate_nice_smooth.py \
    > logs/r4/validate_nice_smooth.log 2>&1
  say "DONE validate_nice_smooth rc=$?"
fi
if [ $(( HARD_STOP - $(now) )) -gt 11400 ] && \
   { [ -f logs/r4/NICE_SMOOTH_VALIDATED ] || [ -f logs/r3/NICE_SMOOTH_VALIDATED ] || \
     [ -f results/r4/NICE_SMOOTH_VALIDATED ]; }; then
  run 10800 nice_smooth_dis_lv target=nice_smooth solver=dis \
    eval_init=False eval_interval=20000
fi

# --- d=1 Pallas Sinkhorn zero-padding probes (VERDICT r4 #7) ----------------
# MANUAL OPT-IN ONLY (touch logs/r4/RUN_D1): the padded launch shapes are
# identical to the validated d=2 stages, but the round-3 d=1 incident
# killed the RELAY and a repeat before the driver's round-end bench would
# null BENCH_r04. Quick-abort: a failed stage stops the sequence; NEVER
# loop-retry.
if [ -f logs/r4/RUN_D1 ] && [ ! -f logs/r4/PALLAS_D1_OK ] && \
   [ $(( HARD_STOP - $(now) )) -gt 2400 ]; then
  d1_ok=1
  for stage in single_d1 grid_d1 bench_d1; do
    say "d1 probe stage=$stage"
    timeout 600 python scripts/pallas_probe.py "$stage" \
      >> logs/r4/pallas_d1_probe.log 2>&1
    rc=$?
    say "d1 probe stage=$stage rc=$rc"
    if [ $rc -ne 0 ]; then d1_ok=0; break; fi
  done
  if [ $d1_ok -eq 1 ]; then
    touch logs/r4/PALLAS_D1_OK
    cp -f logs/r4/pallas_d1_probe.log results/r4/ 2>/dev/null
    commit_paths "r4: d=1 pallas probe log (all stages OK)" results/r4/pallas_d1_probe.log
    say "ALL d1 stages OK — flip sinkhorn_pallas.D1_HARDWARE_VALIDATED"
  fi
fi

touch logs/r4/QUEUE_DONE
say "ALL DONE"
