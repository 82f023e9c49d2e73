#!/bin/bash
# Resume the failed cox_whitened_60k cell (VERDICT r4 #6).
#
# The 08:43 attempt died at its step-20000 eval: the pregen-noise buffer
# (800 eval steps x 100k batch x d=1600 f32 = 512 GB) OOM'd the 16 GB
# chip. Commit 036ee84 gates pregen on PREGEN_MAX_BYTES (4 GiB) with an
# in-loop-draw fallback, so the eval now takes the r2-proven path.
# Relaunching with the SAME out_dir restores ckpt010000.pkl and resumes
# training at step 10000 (r2 resume recipe, CLAUDE.md).
#
# Usage: bash bin/r5_cox_resume.sh [HARD_STOP]  (UTC 'YYYY-MM-DD HH:MM')
set -u
cd "$(dirname "$0")/.."

exec 9>logs/r5_queue.lock
flock -n 9 || { echo "[r5cox] queue lock held — not starting"; exit 1; }
echo $$ > logs/r5_cox_resume.pid

HARD_STOP=$(date -ud "${1:-2026-08-19 14:10}" +%s)
now() { date -u +%s; }
say() { echo "[r5cox] $* $(date -u +%H:%M:%S)"; }

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

name=cox_whitened_60k
budget=$(( HARD_STOP - $(now) ))
if [ "$budget" -lt 1200 ]; then say "no time — abort"; exit 1; fi
say "RESUME $name from ckpt010000 (budget ${budget}s)"
timeout "$budget" python scripts/main.py \
  target=cox +target.use_whitened=True solver=dis \
  train_steps=60000 train_batch_size=1024 eval_batch_size=100000 \
  ckpt_interval=10000 eval_init=False eval_interval=20000 \
  out_dir="logs/r5/$name" > "logs/r5/${name}_resume.log" 2>&1
rc=$?
say "DONE $name rc=$rc"

mkdir -p "results/r5/$name"
cp -f "logs/r5/$name/metrics.jsonl" "results/r5/$name/" 2>/dev/null
cp -f "logs/r5/$name"/*.yaml "results/r5/$name/" 2>/dev/null
if [ -d "logs/r5/$name/plots" ]; then
  mkdir -p "results/r5/$name/plots"
  cp -f "logs/r5/$name/plots/"*.png "results/r5/$name/plots/" 2>/dev/null
fi
tail -c 20000 "logs/r5/${name}_resume.log" > "results/r5/$name/run.log.tail"
commit_paths "r5: cox_whitened_60k resumed past the pregen OOM (rc=$rc)" \
  "results/r5/$name"
say "EXIT"
