#!/usr/bin/env bash
# Local CI gate (reference analog: scripts/pre_merge_check.sh:18-93):
# build the native runtime, generate the suite, run the verifier with the
# baseline regression gate, then the unit/integration tests.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/5] native IO runtime =="
python setup.py build_ext --inplace >/dev/null

echo "== [2/5] test suite generation =="
python -m tpuflow.eval.patterns --output-dir test_suite >/dev/null

echo "== [3/5] verifier + baseline regression gate (10%) =="
python -m tpuflow.eval.verifier --compare-baseline --no-visualizations \
    --suite-dir test_suite --output-dir results

echo "== [4/5] VO trajectory gate (ATE/RPE, 10%) =="
python -m tpuflow.eval.vo_verifier --compare-baseline

echo "== [5/5] pytest =="
python -m pytest tests/ -q

echo "pre-merge check PASSED"
