#!/bin/bash
# Staged Pallas Sinkhorn hardware validation with quick-abort (CLAUDE.md:
# a crashed Mosaic kernel wedges the tunneled TPU; never loop-retry).
# Run ONLY when no other TPU work is queued.
set -u
cd "$(dirname "$0")/.."
# Default stages validate the d>=2 kernels; pass explicit stages to probe
# the d=1 zero-padding path: bash bin/pallas_probe.sh single_d1 grid_d1
# bench_d1 (all three must pass on hardware BEFORE flipping
# sinkhorn_pallas.D1_HARDWARE_VALIDATED).
STAGES=("$@")
[ ${#STAGES[@]} -eq 0 ] && STAGES=(single grid bench)
for stage in "${STAGES[@]}"; do
  echo "=== pallas_probe stage=$stage $(date +%H:%M:%S) ==="
  timeout 600 python scripts/pallas_probe.py "$stage"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== stage $stage FAILED rc=$rc — ABORTING (leave the chip quiet) ==="
    exit $rc
  fi
done
echo "=== all pallas probe stages OK ==="
