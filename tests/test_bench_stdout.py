"""The driver records only the LAST 2000 bytes of bench.py's stdout —
an over-long line head-truncates to ``parsed: null`` and the round
loses its bench evidence (BENCH_r06/r07 did exactly that). Pin the
round-12 stdout ladder: driver-contract keys on every rung, calib
floats at full precision (VERDICT r11 item 6), magnitude-aware query
precision that never degrades to the r11 one-decimal floor for the
current suite size, and a loud failure here the moment HEADLINE grows
past what the cap can carry."""

import importlib.util
import json
import os

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _payload(bench, names):
    """Worst-case-width warm dict over ``names``: 4-decimal values
    spread across the magnitude tiers (sub-second, 1-10 s, >10 s)."""
    warm = {}
    for i, n in enumerate(names):
        warm[n] = [0.2345, 0.8765, 3.4567, 1.2345, 14.5678][i % 5]
    out = {
        "metric": "headline_suite_seconds",
        "value": 123.4567,
        "sf": 0.1,
        "warm_total": sum(warm.values()),
        "calib_s": [0.1676, 0.1474],
        "calib_par_s": [0.1796, 0.1699],
        "calib_spark_s": 0.3228,
    }
    vs = {
        "warm_geomean_vs_prev": 0.9098,
        "warm_geomean_vs_prev_calib_norm": 1.0551,
        "calib_norm_model": "damped_sqrt",
        "verdict": "host_dominated",
    }
    return out, warm, vs


def test_headline_suite_fits_the_cap_with_real_names(bench):
    """The ACTUAL headline list with worst-case value widths must fit —
    this is the test that fails loudly when a gate is added to HEADLINE
    without re-checking the byte budget."""
    out, warm, vs = _payload(bench, bench.HEADLINE)
    line = bench._stdout_line(out, warm, {}, vs)
    assert len(line) <= bench._STDOUT_CAP, (
        f"{len(line)} bytes > cap {bench._STDOUT_CAP}: HEADLINE grew "
        "past the driver's 2000-byte stdout budget — trim the ladder "
        "or the suite"
    )
    d = json.loads(line)
    # driver-contract keys survive every degradation rung
    for key in ("metric", "value", "unit", "sf", "queries"):
        assert key in d, f"contract key {key!r} missing"
    assert d["queries_are"] == "warm_median"
    assert set(d["queries"]) == set(bench.HEADLINE)


def test_calib_full_precision_and_query_precision_floor(bench):
    out, warm, vs = _payload(bench, bench.HEADLINE)
    d = json.loads(bench._stdout_line(out, warm, {}, vs))
    # VERDICT r11 item 6: calib at full 4-decimal precision — the r11
    # line rounded them to [0.2, 0.1] and made the normalization
    # unreproducible from the driver artifact
    assert d["calib_s"] == [0.1676, 0.1474]
    assert d["calib_par_s"] == [0.1796, 0.1699]
    assert d["calib_spark_s"] == 0.3228
    # sub-second gates keep >= 2 decimals at the current suite size
    # (r11's one-decimal floor put 25% rounding error on a 0.25 s gate)
    sub = [v for v in d["queries"].values() if v < 1]
    assert sub and all(round(v, 2) == v and round(v, 1) != v for v in sub[:1])
    assert abs(d["queries"][bench.HEADLINE[0]] - 0.2345) <= 0.005
    # compact verdict present
    assert d["vs_prev"]["verdict"] == "host_dominated"
    assert d["vs_prev"]["model"] == "damped_sqrt"


def test_parse_survives_tail_capture(bench):
    """Reconstruct the driver's capture: progress-bar noise before the
    line, keep only the last 2000 bytes, and the line must still parse
    out whole (the r06/r07 failure was the head of the line being cut)."""
    out, warm, vs = _payload(bench, bench.HEADLINE)
    line = bench._stdout_line(out, warm, {}, vs)
    stdout = ("[Stage 7:====>    (3 + 29) / 32]\r" * 200) + line + "\n"
    tail = stdout[-2000:]
    start = tail.find('{"metric"')
    assert start != -1, "line head was truncated by the 2000-byte tail"
    parsed = json.loads(tail[start:].strip())
    assert parsed["queries"] == json.loads(line)["queries"]


def test_subset_mode_line_is_small(bench):
    """SPARK_GRAFT_BENCH_ONLY depth benches (sf1) emit far fewer
    queries — the ladder's FIRST rung applies, keeping warm_total and
    3-decimal sub-second values."""
    out, warm, vs = _payload(bench, bench.HEADLINE[:15])
    d = json.loads(bench._stdout_line(out, warm, {}, vs))
    assert "warm_total" in d  # ceremony kept when budget allows
    assert d["queries"][bench.HEADLINE[0]] == 0.234  # 3-decimal tier
