#!/usr/bin/env bash
# 4K (3840x2160) production bring-up gate — run on a real TPU.
#
# VERDICT r3 item 6: the 4K story needs (a) a production-config
# per-stage profile + bench line and (b) a gated ACCURACY check at 4K.
# The 13-pattern suite is 320x240; at 4K the ruler is the dense
# analytic ground-truth field (verifier --dense-gt), scored on a
# 4-pattern subset that covers translation / vertical / rotation /
# exact-zero classes. Thresholds: dense-GT EPE bounds sized from the
# committed 4K capture (benchmarks/r04/verify_4k_production.json) with
# the same 10% headroom discipline as the flow gate.
#
# Usage: scripts/check_4k.sh [--update]
#   --update  recapture benchmarks/r04/verify_4k_production.json from
#             this run instead of gating against it.

set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"

SUITE=/tmp/suite_4k
PATTERNS=(translate_medium translate_vertical rotate_small no_motion)

echo "== 1/3 generate 4K pattern subset =="
for p in "${PATTERNS[@]}"; do
    [ -d "$SUITE/$p" ] || python -m tpuflow.eval.patterns \
        --pattern "$p" --width 3840 --height 2160 --output-dir "$SUITE"
done
python - <<'PYEOF'
import json
from pathlib import Path

from tpuflow.eval.patterns import TEST_PATTERNS

suite = Path("/tmp/suite_4k")
names = ["translate_medium", "translate_vertical", "rotate_small",
         "no_motion"]
index = {
    "suite_name": "4K production bring-up subset",
    "resolution": {"width": 3840, "height": 2160},
    "num_patterns": len(names),
    "patterns": {
        n: {
            "name": n,
            "dx": TEST_PATTERNS[n].dx,
            "dy": TEST_PATTERNS[n].dy,
            "rotation": TEST_PATTERNS[n].rotation,
            "scale": TEST_PATTERNS[n].scale,
            "description": TEST_PATTERNS[n].description,
        }
        for n in names
    },
}
(suite / "suite_index.json").write_text(json.dumps(index, indent=2))
print("suite index:", suite / "suite_index.json")
PYEOF

echo "== 2/3 verifier (production fast path, dense analytic GT) =="
timeout 3600 python -m tpuflow.eval.verifier \
    --backend pallas \
    --pyramid-config production \
    --dense-gt \
    --suite-dir "$SUITE" \
    --output-dir /tmp/verify_4k \
    --no-visualizations

echo "== 3/3 gate dense-GT metrics vs the committed 4K capture =="
python - "$@" <<'PYEOF'
import json
import shutil
import sys
from pathlib import Path

run = json.loads(Path("/tmp/verify_4k/verification_results.json").read_text())
snap_path = Path("benchmarks/r04/verify_4k_production.json")
if "--update" in sys.argv:
    snap_path.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy("/tmp/verify_4k/verification_results.json", snap_path)
    print(f"updated {snap_path}")
    sys.exit(0)
snap = json.loads(snap_path.read_text())

def dense_epe(doc, pattern, mode):
    return doc["patterns"][pattern][mode]["dense_metrics"]["epe"]

failures = []
for pattern in snap["patterns"]:
    for mode in ("pyramidal",):
        base = dense_epe(snap, pattern, mode)
        curr = dense_epe(run, pattern, mode)
        if base < 1e-6:
            ok = curr < 1e-6  # no_motion stays exactly zero
        else:
            ok = abs(curr - base) <= 0.10 * base
        print(f"{pattern:20s} {mode}: dense EPE {curr:.4f} "
              f"(baseline {base:.4f}) {'OK' if ok else 'REGRESSION'}")
        if not ok:
            failures.append(pattern)
if failures:
    print("4K dense-GT regression:", failures)
    sys.exit(1)
print("4K accuracy gate: OK")
PYEOF

echo "4K check: OK"
