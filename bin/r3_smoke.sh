#!/bin/bash
# CPU smoke of every config queued for the round-3 chip runs (CLAUDE.md
# lesson: smoke every queued chip config on CPU first — tiny steps/batch
# WITH an eval so the metrics path is exercised).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r3_smoke

PASS=0; FAIL=0
run() {
  local name="$1"; shift
  echo "=== [smoke] $name: $*"
  if env -u PYTHONPATH JAX_PLATFORMS=cpu \
      python scripts/main.py "$@" \
      train_steps=2 train_batch_size=8 eval_batch_size=64 eval_init=False \
      eval_interval=2 plot_results=False store_last_ckpt=False \
      "~eval_sample_losses" out_dir="logs/r3_smoke/$name" \
      > "logs/r3_smoke/$name.log" 2>&1; then
    echo "    OK"; PASS=$((PASS+1))
  else
    echo "    FAIL (see logs/r3_smoke/$name.log)"; FAIL=$((FAIL+1))
  fi
}

# New solver-family cells (paper-scale configs, tiny budget)
run bridge_gmm     target=gmm solver=bridge
run subtraj_gmm    target=gmm solver=dis_subtraj
run euler_dds_gmm  target=gmm solver=dds_euler

# kl_ito / lv_traj estimator columns on the remaining grid targets
for tgt in funnel dw_shift mw; do
  run ${tgt}_dis_kl_ito  target=$tgt solver=dis loss.method=kl_ito
  run ${tgt}_dis_lv_traj target=$tgt solver=dis loss.method=lv_traj \
    loss.traj_per_sample=8
done

# Straggler re-runs under current code
run mw_50d_dis target=mw_50d solver=dis
run rosenbrock_dis target=rosenbrock solver=dis

# Cox with the NEW default 800-step eval grid (conf/target/cox.yaml)
run cox_new_conf target=cox +target.use_whitened=True solver=dis

echo "=== smoke summary: $PASS ok, $FAIL failed"
[ "$FAIL" -eq 0 ] && touch logs/r3_smoke/ALL_OK
