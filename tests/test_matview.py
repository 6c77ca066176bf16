"""IncrementalAggregate: commit-log-maintained materialized aggregates
— refreshes read O(changes) (pinned via the files_read stat), results
always equal a full recompute, merges trigger partition-scoped
recompute only."""

from pyspark.sql import functions as F

from ftm_lakehouse_spark.lakehouse import Lakehouse
from ftm_lakehouse_spark.operators.matview import IncrementalAggregate

from .test_lakehouse import ACME, JANE, PAY, entities_df


def _full(ds):
    return {
        (r["schema"], r["n"])
        for r in ds.store.raw().groupBy("schema").agg(F.count("*").alias("n")).collect()
    }


def _view(view):
    return {(r["schema"], r["n"]) for r in view.read().collect()}


def test_incremental_refresh_reads_only_changes(spark, lake_root, tmp_path):
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("mv1")
    view = IncrementalAggregate(ds.store, str(tmp_path / "view"), keys=["schema"])

    ds.write_entities(entities_df(spark, JANE), origin="a")
    r1 = view.refresh()
    assert r1["refreshed"] and r1["files_read"] > 0
    assert _view(view) == _full(ds)

    # second refresh with no new commits: no-op
    assert view.refresh() == {
        "version": r1["version"],
        "refreshed": False,
        "files_read": 0,
    }

    # an append refreshes from ONLY the new files
    ds.write_entities(entities_df(spark, ACME, PAY), origin="b")
    new_files = len(ds.store.commits.read(r1["version"])[0]["files_added"])
    r2 = view.refresh()
    assert r2["files_read"] == new_files  # not the whole table
    assert _view(view) == _full(ds)


def test_merge_triggers_partition_scoped_recompute(spark, lake_root, tmp_path):
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("mv2")
    view = IncrementalAggregate(ds.store, str(tmp_path / "view"), keys=["schema"])

    ds.write_entities(entities_df(spark, JANE), origin="stable")
    ds.write_entities(entities_df(spark, JANE), origin="stable")  # dup → dirty
    ds.write_entities(entities_df(spark, ACME), origin="other")
    view.refresh()
    before = _view(view)
    assert before == _full(ds)

    assert ds.merge() is True  # rewrites BOTH dirty partitions
    snap_files = {
        f for f in ds.store.commits.snapshot()
    }
    r = view.refresh()
    assert r["refreshed"] and r["rewritten_partitions"] >= 1
    # recompute read at most the live files of rewritten partitions
    assert r["files_read"] <= len(snap_files)
    assert _view(view) == _full(ds)  # dedupe reflected (fewer jane rows)
    assert _view(view) != before


def test_view_with_sum_measures(spark, lake_root, tmp_path):
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("mv3")
    view = IncrementalAggregate(
        ds.store, str(tmp_path / "view"), keys=["prop"], sums=["external"]
    )
    ds.write_entities(entities_df(spark, JANE, ACME), origin="a")
    view.refresh()
    got = {r["prop"]: (r["n"], r["sum_external"]) for r in view.read().collect()}
    want = {
        r["prop"]: (r["n"], r["s"])
        for r in ds.store.raw()
        .groupBy("prop")
        .agg(F.count("*").alias("n"), F.sum(F.col("external").cast("double")).alias("s"))
        .collect()
    }
    assert got == want


def test_rebuild_after_log_truncation(spark, lake_root, tmp_path, monkeypatch):
    """Log cleanup removed records inside the view's refresh span →
    refresh must detect it and fall back to a full rebuild instead of
    silently folding an incomplete span (round-2 ADVICE, medium)."""
    from datetime import datetime, timezone

    from ftm_lakehouse_spark.sources import commits as commits_mod

    monkeypatch.setattr(commits_mod, "CHECKPOINT_INTERVAL", 4)
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("mv4")
    view = IncrementalAggregate(ds.store, str(tmp_path / "view"), keys=["schema"])
    ds.write_entities(entities_df(spark, JANE), origin="a")
    view.refresh()
    assert view.version() == 1
    for _ in range(4):  # commits 2-5; checkpoint at 4
        ds.write_entities(entities_df(spark, ACME), origin="b")
    removed = ds.store.commits.cleanup(datetime.now(timezone.utc))
    assert removed  # records (1..4] gone — the view's span is truncated
    assert ds.store.commits.oldest_version() > view.version() + 1

    r = view.refresh()
    assert r["refreshed"] and r.get("rebuilt") is True
    assert _view(view) == _full(ds)


def test_rebuild_when_state_directory_missing(spark, lake_root, tmp_path):
    """Meta references a state directory that is gone (crash damage) —
    refresh must rebuild, not fold new changes onto an empty state
    (round-2 ADVICE, medium)."""
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("mv5")
    view = IncrementalAggregate(ds.store, str(tmp_path / "view"), keys=["schema"])
    ds.write_entities(entities_df(spark, JANE), origin="a")
    view.refresh()
    d = view._state_dir()
    assert d is not None
    view._fs.delete(d)

    ds.write_entities(entities_df(spark, ACME, PAY), origin="b")
    r = view.refresh()
    assert r.get("rebuilt") is True
    assert _view(view) == _full(ds)


def test_state_swap_is_versioned_and_cleaned(spark, lake_root, tmp_path):
    """Each refresh publishes state-{version} and flips the meta
    atomically; superseded directories are deleted LAST so no reader
    ever observes a meta pointing at a missing directory."""
    import json

    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("mv6")
    view = IncrementalAggregate(ds.store, str(tmp_path / "view"), keys=["schema"])
    ds.write_entities(entities_df(spark, JANE), origin="a")
    view.refresh()
    ds.write_entities(entities_df(spark, ACME), origin="b")
    view.refresh()

    meta = json.loads(view._fs.read_text(view._meta))
    dirs = sorted(n for n in view._fs.listdir(view.path) if n.startswith("state"))
    # the referenced dir plus AT MOST the immediately-previous one —
    # kept as the grace window for readers that resolved the old meta
    # just before the flip; the next refresh sweeps it
    assert meta["state"] in dirs and len(dirs) <= 2
    assert dirs[-1] == meta["state"]
    assert meta["state"] == f"state-{meta['version']:012d}"
    assert _view(view) == _full(ds)

    # a third refresh reaps the oldest: never more than two dirs
    ds.write_entities(entities_df(spark, PAY), origin="c")
    view.refresh()
    meta = json.loads(view._fs.read_text(view._meta))
    dirs = sorted(n for n in view._fs.listdir(view.path) if n.startswith("state"))
    assert dirs[-1] == meta["state"] and len(dirs) <= 2
    assert _view(view) == _full(ds)
