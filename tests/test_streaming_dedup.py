"""Ingestion-time streaming dedup: exact + MinHash tiers against the
accepted-corpus indexes, greedy arrival-order semantics, idempotent
epoch replay."""

import os

from ftm_lakehouse_spark.streaming.dedup_stream import StreamingCorpusDedup

BASE = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
DOCS_DROP1 = [
    (1, BASE),
    (2, BASE),  # exact dup of 1 (same batch)
    (3, "completely different text about spark engines and parquet files here today"),
]
DOCS_DROP2 = [
    (4, BASE),  # exact dup of accepted 1 (cross-batch)
    (5, BASE.replace("tonight", "yesterday")),  # near dup of accepted 1
    (6, "yet another unrelated document mentioning databases and columnar storage formats"),
]


def _drop(spark, tmp_path, name, rows):
    p = str(tmp_path / "src" / name)
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)


def _run_once(dd):
    q = dd.start(trigger_once=True)
    q.awaitTermination(180)


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    dd = StreamingCorpusDedup(spark, src, str(tmp_path / "work"), threshold=0.7)

    _drop(spark, tmp_path, "d1", DOCS_DROP1)
    _run_once(dd)
    assert {r["doc_id"] for r in dd.accepted().collect()} == {1, 3}

    _drop(spark, tmp_path, "d2", DOCS_DROP2)
    _run_once(dd)
    got = {r["doc_id"] for r in dd.accepted().collect()}
    # 4 exact-dups accepted 1; 5 near-dups accepted 1; 6 is novel
    assert got == {1, 3, 6}


def test_streaming_dedup_epoch_replay_is_idempotent(spark, tmp_path):
    """Re-running an epoch (the at-least-once replay) rewrites the same
    epoch slice instead of duplicating corpus or index rows."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    dd = StreamingCorpusDedup(spark, src, str(tmp_path / "work"), threshold=0.7)
    _drop(spark, tmp_path, "d1", DOCS_DROP1)
    _run_once(dd)
    before = sorted(r["doc_id"] for r in dd.accepted().collect())

    # simulate the replay: run the same batch through the same epoch id
    batch = spark.createDataFrame(DOCS_DROP1, ["doc_id", "text"])
    dd._sink(batch, epoch=0)
    after = sorted(r["doc_id"] for r in dd.accepted().collect())
    assert after == before

    sigs = spark.read.parquet(dd.sig_dir)
    assert sigs.count() == sigs.select("doc_id").distinct().count()


def test_streaming_dedup_state_is_bounded(spark, tmp_path):
    """Index state carries 16 longs + hash per ACCEPTED doc — dropped
    docs leave nothing behind."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    dd = StreamingCorpusDedup(spark, src, str(tmp_path / "work"), threshold=0.7)
    _drop(spark, tmp_path, "d1", DOCS_DROP1)
    _run_once(dd)
    assert spark.read.parquet(dd.sig_dir).count() == 2  # only accepted
    assert spark.read.parquet(dd.hash_dir).count() == 2
