"""bench.py's self-adjudicating round-over-round comparison (round 11,
VERDICT r10 item 6): the artifact must carry its own verdict — the warm
geomean vs the newest committed driver artifact, raw AND normalized by
the parallel-calibration ratio, so host contention divides out instead
of needing a judge session (the r9 1.37× uniform phantom)."""

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


@pytest.fixture(scope="module")
def prev():
    f = os.path.join(_ROOT, "BENCH_r10.json")
    if not os.path.exists(f):
        pytest.skip("no committed driver artifact")
    return json.load(open(f))["parsed"]


def test_identical_round_reads_as_one(bench, prev):
    res = bench._vs_prev(prev["queries"], prev["calib_par_s"], _ROOT)
    assert res["warm_geomean_vs_prev"] == 1.0
    assert res["warm_geomean_vs_prev_calib_norm"] == 1.0
    assert res["n_common"] == len(prev["queries"])


def test_contention_divides_out_of_the_verdict(bench, prev):
    """Queries 30% slower under a host that calibrates 30% slower →
    raw ratio says regression, normalized says unchanged."""
    slower = {k: v * 1.3 for k, v in prev["queries"].items()}
    contended = [c * 1.3 for c in prev["calib_par_s"]]
    res = bench._vs_prev(slower, contended, _ROOT)
    assert res["warm_geomean_vs_prev"] == pytest.approx(1.3, abs=0.01)
    assert res["warm_geomean_vs_prev_calib_norm"] == pytest.approx(1.0, abs=0.01)


def test_fast_host_does_not_flatter(bench, prev):
    """Same engine on a 2× faster host: raw 0.5 would read as a win;
    the normalized ratio reads 1.0 — no free lunch from the host."""
    faster = {k: v * 0.5 for k, v in prev["queries"].items()}
    idle = [c * 0.5 for c in prev["calib_par_s"]]
    res = bench._vs_prev(faster, idle, _ROOT)
    assert res["warm_geomean_vs_prev_calib_norm"] == pytest.approx(1.0, abs=0.01)


def test_graceful_when_no_artifact(bench, tmp_path):
    assert bench._vs_prev({"q": 1.0}, [0.1, 0.1], str(tmp_path)) is None
