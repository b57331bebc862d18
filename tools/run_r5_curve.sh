#!/bin/bash
# Round-5 bb144 production curve: R=6 points at the flagship config plus
# the R=12 rows (VERDICT r4 item 6).  Run from /root/repo with the
# flagship widths already warm in the XLA cache.  Writes one JSON line
# per point to benchmarks/results/bb144_r5_curve.jsonl (resumable: rerun
# skips nothing, so comment out finished lines when restarting).
set -x
export PYTHONPATH="/root/repo:$PYTHONPATH"
OUT=benchmarks/results/bb144_r5_curve.jsonl
CFG="--members 6 --relay 8 --deep 500 --deep-dtype bf16 --layout check \
     --batch 1024 --deep-bucket 256 --pipeline 4 --lam 60 --lam3 40"

# R=6 curve
timeout 3600 python benchmarks/circuit_level_bb144_r5.py --p 0.001 \
    --rounds 6 --shots 196608 --seed 23 $CFG --tag curve_p001 --out $OUT
timeout 3600 python benchmarks/circuit_level_bb144_r5.py --p 0.002 \
    --rounds 6 --shots 65536 --seed 23 $CFG --tag curve_p002 --out $OUT
timeout 5400 python benchmarks/circuit_level_bb144_r5.py --p 0.0005 \
    --rounds 6 --shots 524288 --seed 23 $CFG --tag curve_p0005 \
    --max-seconds 4200 --out $OUT

# R=12 rows (per-round normalization check on the wide DEM)
timeout 3600 python benchmarks/circuit_level_bb144_r5.py --p 0.003 \
    --rounds 12 --shots 16384 --seed 23 $CFG --tag curve_r12_p003 --out $OUT
timeout 3600 python benchmarks/circuit_level_bb144_r5.py --p 0.001 \
    --rounds 12 --shots 65536 --seed 23 $CFG --tag curve_r12_p001 \
    --max-seconds 3000 --out $OUT
echo CURVE-DONE
