"""End-to-end regression gate: the full 13-pattern suite vs the
reference repo's committed baseline (the primary parity gate, SURVEY.md
§4 ring 2 — 10% threshold on mae_u/mae_v/epe for both modes)."""

import json

import numpy as np
import pytest

from tpuflow.eval import patterns, verifier


@pytest.fixture(scope="module")
def suite_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("suite")
    patterns.generate_full_suite(output_dir=d, save_png=False)
    return d


def test_pattern_generation_manifest(suite_dir):
    index = json.loads((suite_dir / "suite_index.json").read_text())
    assert index["num_patterns"] == 13
    assert set(index["patterns"]) == set(patterns.TEST_PATTERNS)


def test_frames_are_deterministic(suite_dir):
    d = patterns.load_test_pattern(suite_dir / "translate_medium")
    assert d["frame_prev"].shape == (240, 320)
    f0, _ = patterns.generate_test_pattern(
        patterns.TEST_PATTERNS["translate_medium"], output_dir=None
    )
    np.testing.assert_array_equal(d["frame_prev"], f0.astype(np.float32))


def test_region_masks():
    m = verifier.get_test_region_mask((240, 320), "translate_medium")
    assert m.sum() == (240 - 20) * (320 - 20)
    m = verifier.get_test_region_mask((240, 320), "rotate_small")
    assert m.sum() == 80 * 80


def test_classification_thresholds():
    assert verifier.classify_result(0.3, 0.2, "translate_small") == "Pass"
    assert verifier.classify_result(1.5, 0.2, "translate_small") == "Warning"
    assert verifier.classify_result(3.0, 0.2, "translate_small") == "Fail"
    assert verifier.classify_result(0.9, 0.9, "rotate_small") == "Pass"
    assert verifier.classify_result(4.0, 4.0, "translate_rotate") == "Warning"


def test_compare_metrics_flags_regressions():
    cmp = verifier.compare_metrics(
        {"mae_u": 1.2, "mae_v": 1.0, "epe": 1.0},
        {"mae_u": 1.0, "mae_v": 1.0, "epe": 1.0},
    )
    assert not cmp["passed"]
    cmp = verifier.compare_metrics(
        {"mae_u": 1.05, "mae_v": 1.0, "epe": 1.0},
        {"mae_u": 1.0, "mae_v": 1.0, "epe": 1.0},
    )
    assert cmp["passed"]
    # Baseline-zero rule (reference: optical_flow_verifier.py:612-615).
    cmp = verifier.compare_metrics({"mae_u": 0.5}, {"mae_u": 0.0})
    assert not cmp["passed"]


@pytest.mark.slow
def test_full_suite_matches_reference_baseline(suite_dir):
    """The headline parity gate: all 13 patterns, both modes, within 10%
    of the reference's committed verification_baseline.json."""
    results = verifier.run_suite(suite_dir=suite_dir, verbose=False)
    assert len(results) == 13
    ok = verifier.compare_against_baseline(
        results, verifier.REFERENCE_BASELINE, threshold_percent=10.0
    )
    assert ok, "accuracy regression vs reference baseline"

    # no_motion must be *exactly* zero (any numerical dust fails, by design).
    nm = next(r for r in results if r["pattern_name"] == "no_motion")
    assert nm["single_scale"]["metrics"]["epe"] == 0.0
    assert nm["pyramidal"]["metrics"]["epe"] == 0.0


def test_yaml_config_overrides(tmp_path):
    """--config mechanism (reference verification_config.yaml analog):
    thresholds, test region, and named pyramid configs are overridable."""
    import dataclasses

    from tpuflow.core.config import PYRAMID_CONFIGS
    from tpuflow.eval import verifier

    saved = (
        dict(verifier.THRESHOLDS),
        dict(verifier.PATTERN_CATEGORIES),
        verifier.CENTER_CROP,
        verifier.BORDER,
        dict(PYRAMID_CONFIGS),
    )
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "thresholds:\n  translation: [0.1, 0.2]\n"
        "test_region:\n  center_crop: 40\n  border: 5\n"
        "pyramid_configs:\n  tiny:\n    levels: 2\n    window_size: 3\n"
        "regression:\n  threshold_percent: 25.0\n"
    )
    try:
        parsed = verifier.apply_config(cfg)
        assert verifier.THRESHOLDS["translation"] == (0.1, 0.2)
        assert verifier.CENTER_CROP == 40 and verifier.BORDER == 5
        assert PYRAMID_CONFIGS["tiny"].levels == 2
        assert PYRAMID_CONFIGS["tiny"].window_size == 3
        assert parsed["regression"]["threshold_percent"] == 25.0
        # classify uses the overridden thresholds
        assert verifier.classify_result(0.15, 0.0, "translate_small") == "Warning"
        # the default shipped config restores reference values
        verifier.apply_config(verifier.DEFAULT_CONFIG)
        assert verifier.THRESHOLDS["translation"] == (0.5, 2.0)
        assert verifier.CENTER_CROP == 80
    finally:
        (verifier.THRESHOLDS, verifier.PATTERN_CATEGORIES) = (
            saved[0], saved[1],
        )
        verifier.CENTER_CROP, verifier.BORDER = saved[2], saved[3]
        PYRAMID_CONFIGS.clear()
        PYRAMID_CONFIGS.update(saved[4])


def test_update_baseline_roundtrip(tmp_path):
    """--update-baseline writes a baseline that the regression compare
    then passes exactly (reference optical_flow_verifier.py:722-735)."""
    from tpuflow.eval import verifier

    results = [
        {
            "pattern_name": "translate_medium",
            "ground_truth": {"u": 2.0, "v": 0.0},
            "num_test_pixels": 100,
            "single_scale": {
                "metrics": {"mae_u": 0.9, "mae_v": 0.5, "epe": 1.1},
                "status": "Warning",
            },
            "pyramidal": {
                "metrics": {"mae_u": 0.5, "mae_v": 0.4, "epe": 0.7},
                "status": "Warning",
                "config": "default",
            },
            "flow_fields": {"single": (None, None), "pyramidal": (None, None)},
        }
    ]
    path = tmp_path / "baseline.json"
    verifier.update_baseline(results, path)
    assert path.exists()
    assert verifier.compare_against_baseline(results, path, verbose=False)

    # A >10% change is flagged...
    worse = [dict(results[0]) for _ in range(1)]
    worse[0] = {
        **results[0],
        "single_scale": {
            "metrics": {"mae_u": 1.2, "mae_v": 0.5, "epe": 1.1},
            "status": "Warning",
        },
    }
    assert not verifier.compare_against_baseline(worse, path, verbose=False)
    # ...but tolerated at a looser threshold.
    assert verifier.compare_against_baseline(
        worse, path, threshold_percent=50.0, verbose=False
    )


def test_baseline_provenance_guard(tmp_path):
    """A baseline captured with one backend / pyramid config must not
    gate a run of another: mismatches fail the compare outright instead
    of producing spurious metric diffs (code-review r2 finding)."""
    from tpuflow.eval import verifier

    results = [
        {
            "pattern_name": "translate_medium",
            "ground_truth": {"u": 2.0, "v": 0.0},
            "num_test_pixels": 100,
            "single_scale": {
                "metrics": {"mae_u": 0.9, "mae_v": 0.5, "epe": 1.1},
                "status": "Warning",
            },
            "pyramidal": {
                "metrics": {"mae_u": 0.5, "mae_v": 0.4, "epe": 0.7},
                "status": "Warning",
                "config": "default",
            },
            "flow_fields": {"single": (None, None), "pyramidal": (None, None)},
        }
    ]
    path = tmp_path / "baseline.json"
    verifier.update_baseline(results, path, backend="jnp")

    # Matching provenance passes; the recorded backend is in the file.
    import json

    assert json.loads(path.read_text())["backend"] == "jnp"
    assert verifier.compare_against_baseline(
        results, path, verbose=False, backend="jnp"
    )
    # Backend mismatch fails even with identical metrics.
    assert not verifier.compare_against_baseline(
        results, path, verbose=False, backend="pallas"
    )
    # Pyramid-config mismatch fails per pattern.
    narrow = [
        {**results[0], "pyramidal": {**results[0]["pyramidal"],
                                     "config": "narrow_vertical"}}
    ]
    assert not verifier.compare_against_baseline(
        narrow, path, verbose=False, backend="jnp"
    )
    # Legacy baselines without a backend record still compare.
    verifier.update_baseline(results, path)
    assert verifier.compare_against_baseline(
        results, path, verbose=False, backend="pallas"
    )


def test_dense_gt_verifier_column(suite_dir):
    """--dense-gt adds per-mode dense metrics; for pure translation they
    coincide with the scalar-GT metrics, for rotation they score the
    actual spatially-varying field (finite, and distinct from scalar)."""
    from tpuflow.eval import verifier

    results = verifier.run_suite(
        suite_dir=suite_dir,
        pattern_names=["translate_medium", "rotate_medium"],
        verbose=False,
        dense_gt=True,
    )
    by_name = {r["pattern_name"]: r for r in results}

    tm = by_name["translate_medium"]
    for mode in ("single_scale", "pyramidal"):
        m = tm[mode]["metrics"]
        d = tm[mode]["dense_metrics"]
        for k in ("mae_u", "mae_v", "epe"):
            assert abs(m[k] - d[k]) < 1e-4, (mode, k, m[k], d[k])

    rm = by_name["rotate_medium"]
    for mode in ("single_scale", "pyramidal"):
        d = rm[mode]["dense_metrics"]
        assert all(np.isfinite(v) for v in d.values())
        # Dense GT describes the true rotational field; the scalar (0,0)
        # convention overstates the error away from the center.
        assert d["epe"] <= rm[mode]["metrics"]["epe"] + 1e-6

    md = verifier.generate_markdown_table(results)
    assert "Dense Ground Truth" in md
