#!/bin/bash
# Phase 2 (after bin/r2_queue.sh drains): bf16 quality datapoint, staged
# Pallas hardware probe, final bench numbers.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r2

echo "[phase2] start $(date +%H:%M:%S)"

# 1. bf16 matmul-policy quality check: quick-start budget, f32 vs bf16
for prec in float32 bfloat16; do
  if [ ! -f "logs/r2/quick_$prec/metrics.jsonl" ]; then
    echo "[phase2] quick-start $prec $(date +%H:%M:%S)"
    python scripts/main.py target=dw_shift solver=basic_dis \
      matmul_precision=$prec eval_init=False \
      out_dir="logs/r2/quick_$prec" > "logs/r2/quick_$prec.log" 2>&1
    echo "[phase2] quick-start $prec rc=$?"
  fi
done

# 2. bench (f32 + bf16 datapoints + MFU) — BEFORE the pallas probe, so a
# wedged chip can't cost us the bench numbers
python bench.py > logs/r2/bench.json 2> logs/r2/bench.log
echo "[phase2] bench rc=$? $(date +%H:%M:%S)"
cat logs/r2/bench.json

# 3. Pallas Sinkhorn hardware probe (staged, quick-abort) — last: if a
# Mosaic crash wedges the tunneled TPU it recovers in 15-90 min with the
# chip left quiet, and everything else is already in the bag
bash bin/pallas_probe.sh > logs/r2/pallas_probe.log 2>&1
echo "[phase2] pallas probe rc=$? $(date +%H:%M:%S)"

touch logs/r2/PHASE2_DONE
echo "[phase2] done $(date +%H:%M:%S)"
