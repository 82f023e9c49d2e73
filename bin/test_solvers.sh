#!/bin/bash
# Smoke-run every solver preset for 2 training steps (reference:
# bin/slurm_test_solver.sh). Local sequential version.
set -e
cd "$(dirname "$0")/.."
for solver in basic_dis basic_pis basic_dds basic_dds_euler basic_bridge \
    basic_bridge_subtraj basic_dis_subtraj dis dis_no_score pis pis_no_score \
    dds dds_euler bridge bridge_diff_init dis_subtraj bridge_subtraj; do
  echo "=== solver=$solver ==="
  python scripts/main.py solver=$solver target=dw_shift train_steps=2 \
    train_batch_size=8 eval_batch_size=16 eval_init=False \
    plot_results=False store_last_ckpt=False "~eval_sample_losses" \
    out_dir=logs/test_solvers/$solver
done
