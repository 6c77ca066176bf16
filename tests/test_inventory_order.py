"""The driver's correctness window grades only the FIRST 50 entries of
query_map() — pin that the window is curated: the bench-headline
anchors present, every graded slot full-oracle, rows-only checks
excluded (round-2 VERDICT top-next item), and the round-10 rotation
(VERDICT r9 item 1) actually re-samples the inventory: 45/50 window
occupants were NOT in the static r8/r9 window, drawn strictly from
the least-recently-driver-graded gates."""

import json
import os

from ftm_lakehouse_spark.queries.inventory import (
    GRADE_ORDER,
    QUERIES,
    _R9_GRADE_ORDER,
    oracle_map,
    query_map,
)

#: the kept bench-headline capstone anchors — the five shapes the
#: round-over-round bench comparison keys on. The other r9 capstones
#: (winnowing, sequence packing, graph pair, pack codec, blocked k-NN)
#: ceded their slots after their green r9 rows, exactly like earlier
#: rotations; they stay parity-verified outside the window.
ANCHORS = {
    "pipeline_pretrain_corpus",
    "pipeline_ftm_e2e",
    "pipeline_streaming_ingest",
    "pipeline_zorder_scan",
    "q5_local_supplier_volume",
}

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_graded() -> dict[str, int]:
    """gate -> most recent round with a CORRECTNESS row (any result)."""
    last: dict[str, int] = {}
    for rnd in range(1, 10):
        f = os.path.join(_ROOT, f"CORRECTNESS_r{rnd:02d}.json")
        if os.path.exists(f):
            for k in json.load(open(f)):
                last[k] = max(last.get(k, 0), rnd)
    return last


def test_grade_order_is_the_first_fifty():
    assert len(GRADE_ORDER) == 50
    assert len(set(GRADE_ORDER)) == 50
    missing = [n for n in GRADE_ORDER if n not in QUERIES]
    assert not missing, f"GRADE_ORDER names unknown queries: {missing}"
    assert list(query_map())[:50] == GRADE_ORDER


def test_graded_window_carries_maximum_evidence():
    window = set(GRADE_ORDER)
    assert ANCHORS <= window
    # every graded slot has a full value-hash oracle — no rows-only
    # checks burning a slot
    oracles = oracle_map()
    no_oracle = [n for n in GRADE_ORDER if n not in oracles]
    assert not no_oracle, f"graded slots without oracle: {no_oracle}"


def test_nothing_lost_in_reorder():
    # the reorder is a permutation: every registered query still
    # appears exactly once, oracles unchanged
    assert sorted(query_map()) == sorted(QUERIES)
    assert set(oracle_map()) == {n for n, (_, s) in QUERIES.items() if s is not None}


def test_r10_rotation_resamples_the_inventory():
    """VERDICT r9 item 1 bar: >=40 window occupants were NOT in the r9
    window, and the rotated-in gates are exactly the least-recently-
    driver-graded ones (no cherry-picking recently-green gates to
    re-grade)."""
    last = _last_graded()
    if not last:  # fresh checkout without driver artifacts
        return
    rotated = [n for n in GRADE_ORDER if n not in ANCHORS]
    fresh = [n for n in GRADE_ORDER if n not in set(_R9_GRADE_ORDER)]
    assert len(fresh) >= 40, len(fresh)
    # every rotated-in gate was last graded in r7 or earlier (the r8/r9
    # window is exactly the set graded since then)
    stale_rounds = {n: last.get(n, 0) for n in rotated}
    late = {n: r for n, r in stale_rounds.items() if r > 7}
    assert not late, f"rotated-in gates that were recently graded: {late}"
    # and none of the 82 stale gates staler than a window member was
    # skipped: the window holds ALL gates last graded r1-r6 (23+20=43)
    all_stale = sorted(n for n, r in last.items() if r <= 6)
    missing = [n for n in all_stale if n not in set(GRADE_ORDER)]
    assert not missing, f"stalest gates left out of the window: {missing}"
