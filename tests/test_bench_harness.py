"""Unit tests for the scaling-bench summarizer (pure functions, no
Spark): clean-round gating, per-level-minima headline, artifact
completeness. The measurement methodology itself is documented in
bench_scaling.py and BENCH/BASELINE.md §4."""

import bench_scaling as bs


def _round(low, high, eff, clean, ts=0):
    return {
        "low_sec": low, "high_sec": high,
        "low": {"cpus": 2, "docs": 400000, "best_sec": low,
                "docs_per_sec": round(400000 / low, 1)},
        "high": {"cpus": 8, "docs": 400000, "best_sec": high,
                 "docs_per_sec": round(400000 / high, 1)},
        "efficiency": eff,
        "kernel_probe_eff": 1.0, "membw_probe_eff": 1.0,
        "post_kernel_probe_eff": 1.0, "post_membw_probe_eff": 1.0,
        "clean": clean, "ts": ts,
    }


def test_headline_is_per_level_minima_over_clean_rounds():
    rounds = [
        _round(120.0, 40.0, 0.75, True),
        _round(144.0, 36.0, 1.0, True),    # inflated low leg, best high leg
        _round(100.0, 25.0, 1.0, False),   # dirty: excluded from minima
    ]
    s = bs.summarize(rounds)
    # minima over CLEAN rounds only: low 120.0, high 36.0 -> (120/36)/4
    assert s["efficiency"] == round((120.0 / 36.0) / 4, 3)
    assert s["pass"] is True
    assert s["low"]["best_sec"] == 120.0
    assert s["high"]["best_sec"] == 36.0
    assert s["clean_rounds"] == 2
    assert s["all_rounds_were_dirty"] is False
    assert len(s["paired_rounds"]) == 3    # every round stays in the artifact


def test_falls_back_to_dirty_rounds_when_no_clean():
    rounds = [_round(120.0, 45.0, 0.667, False)]
    s = bs.summarize(rounds)
    assert s["efficiency"] == round((120.0 / 45.0) / 4, 3)
    assert s["pass"] is False
    assert s["all_rounds_were_dirty"] is True


def test_median_over_all_rounds():
    rounds = [
        _round(1, 1, 0.5, True),
        _round(1, 1, 0.7, True),
        _round(1, 1, 0.9, False),
    ]
    assert bs.summarize(rounds)["median_all_rounds_efficiency"] == 0.7


def test_kernel_digest_is_stable():
    d1 = bs.kernel_digest()
    d2 = bs.kernel_digest()
    assert d1 == d2 and len(d1) == 12
