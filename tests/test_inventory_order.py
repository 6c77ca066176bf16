"""The driver's correctness window grades only the FIRST 50 entries of
query_map() — pin that the window is curated: the bench-headline
anchors present, every graded slot full-oracle, rows-only checks
excluded (round-2 VERDICT top-next item), and the round-11 rotation
(VERDICT r10 item 1) actually FINISHES the re-sample cycle: 45/50
window occupants were NOT in the r10 window, drawn strictly from the
least-recently-driver-graded gates, and after this round no gate's
last driver grade predates round 9."""

import json
import os

from ftm_lakehouse_spark.queries.inventory import (
    GRADE_ORDER,
    QUERIES,
    _R10_GRADE_ORDER,
    oracle_map,
    query_map,
)

#: the kept bench-headline capstone anchors — the five shapes the
#: round-over-round bench comparison keys on. They hold their window
#: slots every round; everything else rotates by staleness.
ANCHORS = {
    "pipeline_pretrain_corpus",
    "pipeline_ftm_e2e",
    "pipeline_streaming_ingest",
    "pipeline_zorder_scan",
    "q5_local_supplier_volume",
}

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_graded() -> dict[str, int]:
    """gate -> most recent round with a CORRECTNESS row (any result),
    derived from the committed driver artifacts r1-r10."""
    last: dict[str, int] = {}
    for rnd in range(1, 11):
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


def test_r11_rotation_finishes_the_cycle():
    """VERDICT r10 item 1 bar: >=40 window occupants were NOT in the
    r10 window; rotated-in gates are exactly the least-recently-
    driver-graded ones (ALL gates staler than any non-member, no
    cherry-picking); and after this round's grade no gate's last
    driver row predates round 9."""
    last = _last_graded()
    if not last:  # fresh checkout without driver artifacts
        return
    rotated = set(GRADE_ORDER) - ANCHORS
    fresh = [n for n in GRADE_ORDER if n not in set(_R10_GRADE_ORDER)]
    assert len(fresh) >= 40, len(fresh)
    # the window holds ALL gates last graded before r9 (the 37 r7-stale
    # gates): nothing staler than a window member was skipped
    pre_r9 = sorted(n for n, r in last.items() if r < 9)
    missing = [n for n in pre_r9 if n not in rotated]
    assert not missing, f"stalest gates left out of the window: {missing}"
    # the remaining rotated slots hold only r9-graded gates (never
    # r10-graded ones — those are the freshest), picked by the same
    # alphabetical tiebreak the r10 rotation used
    r9_picks = sorted(n for n in rotated if last.get(n, 0) >= 9)
    assert all(last[n] == 9 for n in r9_picks), {n: last[n] for n in r9_picks}
    all_r9 = sorted(n for n, r in last.items() if r == 9)
    assert r9_picks == all_r9[: len(r9_picks)], "r9 picks not the alphabetical stalest"
    # cycle completion: every inventory gate is graded in r9/r10 or
    # sits in this window (i.e. will be graded r11)
    stale_after_r11 = [
        n for n, r in last.items() if r < 9 and n not in set(GRADE_ORDER)
    ]
    assert not stale_after_r11, stale_after_r11
