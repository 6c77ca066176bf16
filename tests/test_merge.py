"""Merge-semantics golden tests — the behavioral contract transplanted
from the reference's SQL-builder suite (tests/test_logic_parquet.py) and
FIXTURES.md F1's pathological cases."""

from ftm_lakehouse_spark.operators.merge import canonicalize

from datetime import datetime

from .helpers import make_df, stmt, ts


def nts(s):
    return datetime.fromisoformat(s)


def canon(spark, rows, **kw):
    return canonicalize(make_df(spark, rows), **kw).collect()


def test_duplicate_id_collapses_to_latest(spark):
    rows = [
        stmt(id="a", value="v", first_seen="2024-01-01T00:00:00", last_seen="2024-01-01T00:00:00"),
        stmt(id="a", value="v", first_seen="2024-01-05T00:00:00", last_seen="2024-02-01T00:00:00"),
    ]
    out = canon(spark, rows)
    assert len(out) == 1
    # latest last_seen wins; first_seen folds to the group MIN even
    # though the earlier row was dropped
    assert out[0]["last_seen"] == nts("2024-02-01T00:00:00")
    assert out[0]["first_seen"] == nts("2024-01-01T00:00:00")


def test_same_id_different_origins_stay_distinct(spark):
    rows = [
        stmt(id="a", origin="crawl"),
        stmt(id="a", origin="bulk"),
    ]
    out = canon(spark, rows)
    assert len(out) == 2
    assert {r["origin"] for r in out} == {"crawl", "bulk"}


def test_tombstone_beats_same_second_live_row(spark):
    rows = [
        stmt(id="a", last_seen="2024-02-01T00:00:00"),
        stmt(id="a", last_seen="2024-02-01T00:00:00", deleted_at="2024-02-01T00:00:00"),
    ]
    out = canon(spark, rows)
    assert len(out) == 1
    assert out[0]["deleted_at"] is not None


def test_tombstone_reap_after_grace(spark):
    rows = [
        stmt(id="old", deleted_at="2024-01-01T00:00:00", last_seen="2024-01-01T00:00:00"),
        stmt(id="new", entity_id="e2", deleted_at="2024-03-01T00:00:00",
             last_seen="2024-03-01T00:00:00"),
        stmt(id="live", entity_id="e3"),
    ]
    out = canon(spark, rows, grace_cutoff=ts("2024-02-01T00:00:00"))
    ids = {r["id"] for r in out}
    assert ids == {"new", "live"}  # old tombstone reaped, recent kept


def test_fragment_supersession_replaces_whole_emission(spark):
    # first emission: two values of `alias` under fragment row1
    # second emission (later second): one different value — replaces BOTH
    rows = [
        stmt(id="a1", prop="alias", value="Janet", fragment="row1",
             last_seen="2024-01-01T00:00:00"),
        stmt(id="a2", prop="alias", value="Janey", fragment="row1",
             last_seen="2024-01-01T00:00:00"),
        stmt(id="b1", prop="alias", value="Jane", fragment="row1",
             last_seen="2024-01-02T00:00:00"),
    ]
    out = canon(spark, rows)
    assert {r["id"] for r in out} == {"b1"}


def test_fragment_ties_at_group_max_all_survive(spark):
    # multi-valued props of ONE emission share one last_seen → all live
    rows = [
        stmt(id="a1", prop="alias", value="Janet", fragment="row1",
             last_seen="2024-01-02T00:00:00"),
        stmt(id="a2", prop="alias", value="Janey", fragment="row1",
             last_seen="2024-01-02T00:00:00"),
        stmt(id="old", prop="alias", value="J", fragment="row1",
             last_seen="2024-01-01T00:00:00"),
    ]
    out = canon(spark, rows)
    assert {r["id"] for r in out} == {"a1", "a2"}


def test_fragment_and_nonfragment_do_not_interact(spark):
    rows = [
        stmt(id="same", prop="name", value="Jane", fragment=""),
        stmt(id="same", prop="name", value="Jane", fragment="row1"),
    ]
    out = canon(spark, rows)
    assert len(out) == 2
    assert {r["fragment"] for r in out} == {"", "row1"}


def test_fragment_scopes_are_per_origin(spark):
    # same fragment group under two origins → isolated supersession scopes
    rows = [
        stmt(id="a", prop="alias", value="v1", fragment="row1", origin="src_a",
             last_seen="2024-01-01T00:00:00"),
        stmt(id="b", prop="alias", value="v2", fragment="row1", origin="src_b",
             last_seen="2024-02-01T00:00:00"),
    ]
    out = canon(spark, rows)
    assert len(out) == 2


def test_merge_is_idempotent(spark):
    rows = [
        stmt(id="a", value="x", last_seen="2024-01-01T00:00:00"),
        stmt(id="a", value="x", last_seen="2024-02-01T00:00:00"),
        stmt(id="f1", prop="alias", value="p", fragment="fr",
             last_seen="2024-01-02T00:00:00"),
        stmt(id="f2", prop="alias", value="q", fragment="fr",
             last_seen="2024-01-02T00:00:00"),
    ]
    once = canonicalize(make_df(spark, rows))
    twice = canonicalize(once)
    a = sorted((r["id"], r["value"]) for r in once.collect())
    b = sorted((r["id"], r["value"]) for r in twice.collect())
    assert a == b


def test_delete_then_same_second_readd(spark):
    # deleted_at DESC NULLS LAST tiebreak: tombstone wins when tied
    rows = [
        stmt(id="a", last_seen="2024-01-05T00:00:00",
             deleted_at="2024-01-05T00:00:00"),
        stmt(id="a", last_seen="2024-01-05T00:00:00"),
        # but a LATER re-add beats the tombstone
        stmt(id="b", entity_id="e2", last_seen="2024-01-06T00:00:00"),
        stmt(id="b", entity_id="e2", last_seen="2024-01-05T00:00:00",
             deleted_at="2024-01-05T00:00:00"),
    ]
    out = {r["id"]: r for r in canon(spark, rows)}
    assert out["a"]["deleted_at"] is not None
    assert out["b"]["deleted_at"] is None
