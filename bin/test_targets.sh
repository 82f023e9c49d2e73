#!/bin/bash
# Smoke-run every target with tiny batches (reference: bin/slurm_test_target.sh).
set -e
cd "$(dirname "$0")/.."
for target in dw_shift gauss_shift gmm funnel mw mw_50d rings rosenbrock img nice cox; do
  echo "=== target=$target ==="
  python scripts/main.py solver=basic_dis target=$target train_steps=2 \
    train_batch_size=8 eval_batch_size=16 eval_init=False \
    plot_results=False store_last_ckpt=False "~eval_sample_losses" \
    out_dir=logs/test_targets/$target
done
