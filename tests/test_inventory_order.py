"""The driver's correctness window grades only the FIRST 50 entries of
query_map() — pin that the window is curated and that the rotation is
GENERATED, not hand-transcribed (round 12, VERDICT r11 item 3): the
committed GRADE_ORDER must equal ``tools/rotate_window.py``'s output
computed from the driver artifacts at the pinned round range.

Hermeticity (VERDICT r11 item 1): every artifact read here goes through
``rotate_window.last_graded(max_round=PINNED_ROUND)``, so the driver
committing CORRECTNESS_r{N>PINNED}.json after the round closes cannot
change this test's input. When regenerating the window next round, bump
``PINNED_ROUND`` together with GRADE_ORDER — the generator prints the
new value.
"""

import importlib.util
import os

from ftm_lakehouse_spark.queries.inventory import (
    GRADE_ORDER,
    QUERIES,
    _R11_GRADE_ORDER,
    oracle_map,
    query_map,
)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the round whose artifacts the committed GRADE_ORDER was generated
#: against — the newest CORRECTNESS_r{N}.json at generation time.
PINNED_ROUND = 11


def _rotate_mod():
    spec = importlib.util.spec_from_file_location(
        "rotate_window", os.path.join(_ROOT, "tools", "rotate_window.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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


def test_grade_order_equals_generated_window():
    """GRADE_ORDER is the generator's output at the pinned round — the
    rotation cannot silently drift from the (last-round asc, name asc)
    staleness rule because the committed list IS the rule's output."""
    rw = _rotate_mod()
    assert rw.ANCHORS == [n for n in GRADE_ORDER if n in ANCHORS][: len(rw.ANCHORS)]
    last, rounds = rw.last_graded(max_round=PINNED_ROUND)
    if not last:  # fresh checkout without driver artifacts
        return
    assert rounds[-1] == PINNED_ROUND, (
        f"PINNED_ROUND={PINNED_ROUND} but newest artifact within range is "
        f"r{rounds[-1]} — regenerate the window and bump the pin"
    )
    assert list(GRADE_ORDER) == rw.compute_window(last)


def test_r12_rotation_keeps_the_cadence():
    """VERDICT r11 item 3 bar: >=40 window occupants were NOT in the
    r11 window, and after this round's grade no gate's last driver
    grade predates round 10 (the r9-stale cohort is fully windowed)."""
    rw = _rotate_mod()
    last, _ = rw.last_graded(max_round=PINNED_ROUND)
    if not last:
        return
    fresh = [n for n in GRADE_ORDER if n not in set(_R11_GRADE_ORDER)]
    assert len(fresh) >= 40, len(fresh)
    # every gate whose last grade predates r10 sits in this window, so
    # after the r12 grade zero pre-r10 grades remain
    stale_after_r12 = [
        n for n, r in last.items() if r < 10 and n not in set(GRADE_ORDER)
    ]
    assert not stale_after_r12, stale_after_r12


def test_pinned_range_immune_to_future_artifacts(tmp_path):
    """The generator input is pinned: a CORRECTNESS artifact from a
    FUTURE round (the driver drops one after every round) must not
    change last_graded(max_round=PINNED_ROUND)'s output. Exercised
    against a synthetic copy of the live artifacts plus a fake r99."""
    import json
    import shutil

    rw = _rotate_mod()
    live, _ = rw.last_graded(max_round=PINNED_ROUND)
    if not live:
        return
    for rnd in range(1, PINNED_ROUND + 1):
        for name in (f"CORRECTNESS_r{rnd:02d}.json", f"CORRECTNESS_r{rnd}.json"):
            src = os.path.join(_ROOT, name)
            if os.path.exists(src):
                shutil.copy(src, tmp_path / name)
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        json.dumps({"totally_new_gate": {"rows_match": True}})
    )
    pinned, rounds = rw.last_graded(root=str(tmp_path), max_round=PINNED_ROUND)
    assert pinned == live
    assert rounds[-1] == PINNED_ROUND
    assert rw.compute_window(pinned) == list(GRADE_ORDER)
