"""Sanity tests for the analytic scaling model (bench_scaling.py
--model; DESIGN §7 round-4 table). The model is the falsifiable backing
for the BASELINE >=0.8 scaling-efficiency claim on this 1-chip rig —
these tests pin its structural properties so a refactor can't silently
invert its conclusions."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench_scaling  # noqa: E402


def _model():
    return bench_scaling.scaling_model(
        [str(REPO / "benchmarks/r04/profile_1080p_production.json")]
    )


def test_model_loads_committed_profile():
    doc = _model()
    profs = doc["assumptions"]["single_chip_profiles"]
    assert profs and profs[0]["h"] == 1080
    assert profs[0]["ms"] > 0.5  # a real measured frame time
    assert doc["predictions"]


def test_dp_axis_carries_the_efficiency_claim():
    """DP has zero inter-chip flow traffic: efficiency ~1.0 at every
    point, including 2 hosts — this is the axis the >=0.8 BASELINE
    claim rides (DESIGN §7)."""
    rows = [r for r in _model()["predictions"] if r["model"] == "dp"]
    assert rows
    for r in rows:
        assert r["predicted_efficiency"] >= 0.99, r
    hosts2 = [r for r in rows if r["hosts"] == 2]
    assert hosts2 and all(r["predicted_efficiency"] >= 0.8 for r in hosts2)


def test_tiled_meets_baseline_target():
    """VERDICT r4 item 1 'done' criterion: with the distributed-coarse
    pyramid, the tiled axis holds >= ~0.8 efficiency at 4 chips and
    cross-host is no longer DCN-gather-bound (a fully-sharded 16-chip
    mesh exists with zero gather traffic and >= 0.8 efficiency)."""
    rows = [r for r in _model()["predictions"] if r["model"] == "tiled"]
    four = [r for r in rows if r["chips"] == 4]
    assert four and all(r["predicted_efficiency"] >= 0.8 for r in four)
    cross = [
        r for r in rows
        if r["hosts"] > 1 and r["gather_ms"] == 0.0
        and r["predicted_efficiency"] >= 0.8
    ]
    assert cross, "no gather-free cross-host mesh reaches 0.8"


def test_tiled_axis_is_amdahl_bounded():
    """Tiled scaling: latency improves with chips (single host) but
    efficiency falls — the model must show BOTH (an honest model, not a
    marketing one)."""
    rows = [
        r for r in _model()["predictions"]
        if r["model"] == "tiled" and r["hosts"] == 1
    ]
    rows.sort(key=lambda r: r["chips"])
    assert len(rows) >= 3
    fps = [r["predicted_fps"] for r in rows]
    eff = [r["predicted_efficiency"] for r in rows]
    assert fps == sorted(fps), "single-host tiled fps must rise with chips"
    assert eff == sorted(eff, reverse=True), "tiled efficiency must fall"
    # Amdahl floor: efficiency bounded by replicated coarse fraction.
    for r in rows:
        assert r["predicted_efficiency"] <= 1.0
        assert r["comm_ms"] >= 0.0


def test_efficiency_never_exceeds_one():
    for r in _model()["predictions"]:
        assert 0.0 < r["predicted_efficiency"] <= 1.0, r


def test_snapshot_matches_model(tmp_path):
    """The committed benchmarks/r04/scaling_model.json was produced by
    this code on the committed profile — regenerate and compare the
    prediction rows (guards against snapshot drift)."""
    snap_path = REPO / "benchmarks/r05/scaling_model.json"
    snap = json.loads(snap_path.read_text())
    fresh = bench_scaling.scaling_model()
    # Compare the 1080p rows (the snapshot may gain 4K rows later).
    def rows_1080(doc):
        return [
            r for r in doc["predictions"] if r["resolution"] == "1920x1080"
        ]
    assert rows_1080(snap) == rows_1080(fresh)
