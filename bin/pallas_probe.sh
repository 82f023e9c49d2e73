#!/bin/bash
# Staged Pallas Sinkhorn hardware validation with quick-abort (CLAUDE.md:
# a crashed Mosaic kernel wedges the tunneled TPU; never loop-retry).
# Run ONLY when no other TPU work is queued.
set -u
cd "$(dirname "$0")/.."
for stage in single grid bench; do
  echo "=== pallas_probe stage=$stage $(date +%H:%M:%S) ==="
  timeout 600 python scripts/pallas_probe.py "$stage"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== stage $stage FAILED rc=$rc — ABORTING (leave the chip quiet) ==="
    exit $rc
  fi
done
echo "=== all pallas probe stages OK ==="
