"""Unit tests for the scaling-bench summarizer (pure functions, no
Spark): clean-round selection, headline computation, merge-key safety.
The measurement methodology itself is documented in bench_scaling.py
and BENCH/BASELINE.md §4."""

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


def test_headline_is_best_clean_round():
    rounds = [
        _round(120.0, 40.0, 0.75, True),
        _round(124.0, 36.0, 0.861, True),
        _round(100.0, 25.0, 1.0, False),   # dirty: never the headline
    ]
    s = bs.summarize(rounds)
    assert s["efficiency"] == 0.861
    assert s["pass"] is True
    assert s["best_round_clean"] is True
    assert s["clean_rounds"] == 2
    assert s["low"]["best_sec"] == 124.0   # headline carries its own round's levels
    assert len(s["paired_rounds"]) == 3    # every round stays in the artifact


def test_headline_falls_back_to_dirty_when_no_clean_rounds():
    rounds = [_round(120.0, 45.0, 0.667, False)]
    s = bs.summarize(rounds)
    assert s["efficiency"] == 0.667
    assert s["pass"] is False
    assert s["best_round_clean"] is False


def test_median_over_all_rounds():
    rounds = [
        _round(1, 1, 0.5, True),
        _round(1, 1, 0.7, True),
        _round(1, 1, 0.9, False),
    ]
    assert bs.summarize(rounds)["median_all_rounds_efficiency"] == 0.7


def test_kernel_digest_is_stable_and_kernel_sensitive():
    d1 = bs.kernel_digest()
    d2 = bs.kernel_digest()
    assert d1 == d2 and len(d1) == 12
