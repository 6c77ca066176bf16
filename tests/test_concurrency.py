"""Optimistic-concurrency protocol: the cross-driver write guarantees
the reference gets from delta-rs (storage/parquet.py:326-475), proven
here on the reimplemented log — put-if-absent version allocation,
append/rewrite race semantics, rewrite/rewrite conflict detection.

The pure-log tests run real OS processes (the actual cross-driver
case); the Spark-facing tests run threads, which share nothing but the
filesystem on this path — the protocol under test is identical."""

import json
import multiprocessing as mp
import threading

import pytest

from ftm_lakehouse_spark.lakehouse import Lakehouse
from ftm_lakehouse_spark.sources.commits import CommitConflict, CommitLog
from ftm_lakehouse_spark.sources.fs import LocalFS

from .test_lakehouse import ACME, JANE, entities_df


def test_write_text_exclusive_single_winner(tmp_path):
    fs = LocalFS()
    p = str(tmp_path / "log" / "v1.json")
    results = []

    def attempt(i):
        results.append((i, fs.write_text_exclusive(p, json.dumps({"writer": i}))))

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    winners = [i for i, won in results if won]
    assert len(winners) == 1
    # the winner's content landed intact — no torn writes
    assert json.loads(fs.read_text(p)) == {"writer": winners[0]}


def _committer(root: str, writer: int, n: int, out):
    log = CommitLog(LocalFS(), root)
    got = []
    for i in range(n):
        v = log.commit("append", [("0", "a", f"w{writer}")], [f"p/w{writer}-{i}.parquet"])
        got.append(v)
    out.put((writer, got))


def test_cross_process_commits_all_land(tmp_path):
    """Two real OS processes race the same log — the actual
    cross-driver scenario. Every commit lands, versions are a
    contiguous 1..2N with no duplicates, and the final snapshot holds
    every file either process added."""
    root = str(tmp_path / "commits")
    n = 8
    q = mp.Queue()
    procs = [
        mp.Process(target=_committer, args=(root, w, n, q)) for w in (1, 2)
    ]
    for p in procs:
        p.start()
    results = dict(q.get(timeout=120) for _ in procs)
    for p in procs:
        p.join(120)
    log = CommitLog(LocalFS(), root)
    versions = sorted(results[1] + results[2])
    assert versions == list(range(1, 2 * n + 1))
    assert log.current_version() == 2 * n
    assert len(log.snapshot()) == 2 * n


def test_append_racing_merge_survives(spark, lake_root):
    """An append that lands between a merge's snapshot read and its
    rewrite commit is NOT lost: the rewrite retires only the files it
    read, the late append's files stay live, and the partition stays
    dirty (append version > rewrite read_version)."""
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("race1")
    ds.write_entities(entities_df(spark, JANE), origin="a")
    ds.write_entities(entities_df(spark, JANE), origin="a")  # dup → dirty
    store = ds.store

    # reproduce merge's read phase with a pinned snapshot
    head = store.commits.current_version()
    snap = store.commits.snapshot(head)
    dirty = store.dirty_partitions()
    target = [f for f in snap if f.split("/origin=")[1].split("/")[0] == "a"]
    data = store._data_path()
    canonical_df = store._read_files([store._fs.join(data, f) for f in target])
    from ftm_lakehouse_spark.operators.merge import canonicalize

    canonical = canonicalize(canonical_df)

    # the RACE: another writer appends before the rewrite commits
    ds.write_entities(entities_df(spark, ACME), origin="a")
    late_version = store.commits.current_version()

    # the rewrite still commits (no file it removes was touched)
    store.overwrite_partitions(
        canonical, expected=dirty, files_removed=target, read_version=head
    )
    # nothing lost: jane canonicalized AND the racing acme row live
    ids = {r["entity_id"] for r in store.live().select("entity_id").distinct().collect()}
    assert ids == {"jane", "acme"}
    # the raced partition is still dirty — the next merge picks it up
    assert store.dirty_partitions() == [("0", "things", "a")] or any(
        p[2] == "a" for p in store.dirty_partitions()
    )
    assert late_version > head


def test_conflicting_rewrites_detected(spark, lake_root):
    """Two rewrites computed from the same snapshot: the first commits,
    the second targets now-retired files and must raise CommitConflict
    instead of double-deleting (Delta's write-write conflict)."""
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("race2")
    ds.write_entities(entities_df(spark, JANE), origin="a")
    ds.write_entities(entities_df(spark, JANE), origin="a")
    store = ds.store

    head = store.commits.current_version()
    snap = store.commits.snapshot(head)
    target = list(snap)
    data = store._data_path()
    from ftm_lakehouse_spark.operators.merge import canonicalize

    canonical = canonicalize(
        store._read_files([store._fs.join(data, f) for f in target])
    )
    parts = [("0", "things", "a")]
    store.overwrite_partitions(
        canonical, expected=parts, files_removed=target, read_version=head
    )
    with pytest.raises(CommitConflict):
        store.overwrite_partitions(
            canonical, expected=parts, files_removed=target, read_version=head
        )
    # the loser's staged files are untracked garbage, never visible,
    # and vacuum reaps them
    live_before = set(store.commits.snapshot())
    reaped = store.vacuum(retention_hours=0)
    assert set(store.commits.snapshot()) == live_before
    assert store._fs.parquet_files(store._data_path()) == live_before
    assert reaped  # the conflicting rewrite's orphans went


def test_txn_append_is_exactly_once(spark, lake_root):
    """Idempotent appends (Delta txnAppId/txnVersion): replaying a
    micro-batch with an already-committed (app, epoch) is a no-op, a
    higher epoch lands, and a stale epoch after a higher one is also
    fenced (watermark semantics)."""
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("txn1")
    df = entities_df(spark, JANE)
    from ftm_lakehouse_spark.operators.explode import explode_entities

    stmts = explode_entities(df, "txn1", origin="s", shards=ds.config.shards)
    store = ds.store

    store.append(stmts, txn=("stream-a", 0))
    n1 = store.raw().count()
    v1 = store.commits.current_version()
    assert store.commits.txn_version("stream-a") == 0

    store.append(stmts, txn=("stream-a", 0))  # replay → skipped
    assert store.raw().count() == n1
    assert store.commits.current_version() == v1

    store.append(stmts, txn=("stream-a", 1))  # next epoch → lands
    assert store.raw().count() == 2 * n1
    assert store.commits.txn_version("stream-a") == 1

    store.append(stmts, txn=("stream-a", 0))  # stale epoch → fenced
    assert store.raw().count() == 2 * n1

    store.append(stmts, txn=("stream-b", 0))  # other app unaffected
    assert store.raw().count() == 3 * n1


def test_lockfree_threaded_appends_distinct_versions(spark, lake_root):
    """N threads append with NO store lock: every append lands as its
    own commit version and every row is readable."""
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("race3")
    errs = []

    def writer(origin):
        try:
            ds.write_entities(entities_df(spark, JANE), origin=origin)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=writer, args=(f"t{i}",)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    assert not errs
    recs = ds.store.commits.read()
    assert [r["version"] for r in recs] == [1, 2, 3, 4]
    assert all(r["kind"] == "append" for r in recs)
    per_origin = [
        ds.store.raw().filter(f"origin = 't{i}'").count() for i in range(4)
    ]
    assert min(per_origin) == max(per_origin) > 0  # all four landed whole
    assert ds.count() == 1  # same entity from 4 origins
    assert len(ds.store.dirty_partitions()) == 4
