#!/usr/bin/env bash
# Regenerate the showcase flow plots (reference analog:
# scripts/regenerate_flow_plots.sh:1-27 — 15 px frames -> single-scale ->
# pyramidal -> comparison plots).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-results/flow_plots}
mkdir -p "$OUT"

echo "== generating 15 px natural frame pair =="
python -m tpuflow.eval.natural --displacement-x 15 --output-dir "$OUT/frames"

echo "== single-scale flow =="
python -m tpuflow.flow "$OUT/frames" \
    --export "$OUT/flow_single.txt" --plot "$OUT/flow_single.png"

echo "== pyramidal flow (+ comparison vs single-scale) =="
python -m tpuflow.flow "$OUT/frames" --pyramidal \
    --export "$OUT/flow_pyramidal.txt" --plot "$OUT/flow_pyramidal.png" \
    --compare "$OUT/flow_single.txt"

echo "== diagnostic panel =="
python -m tpuflow.eval.visualize "$OUT/flow_pyramidal.txt" \
    --compare "$OUT/flow_single.txt" \
    --output "$OUT/flow_diagnostic.png" --title "pyramidal vs single (15 px)"

echo "plots in $OUT/"
