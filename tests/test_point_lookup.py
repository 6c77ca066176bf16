"""Point-lookup files-read pin (SURVEY §7.4 risk 3, round-4 VERDICT
item 5): after merge clusters the store (WRITE_SORT_COLUMNS — entity_id
leads the file sort), ``Dataset.get`` must touch O(1) files — shard
partition pruning cuts the scan to one shard directory, and the
post-merge layout keeps that directory at one file per (bucket,
origin). The pin reads the ACTUAL executed-plan scan metrics
(numFiles), not the plan text, so a regression in pruning or in the
merge's file layout fails loudly."""

import pytest
import os

from pyspark.sql import functions as F


def _scan_metrics(df) -> list[dict]:
    """Executed-plan scan metrics, AQE-unwrapped: collect numFiles /
    numOutputRows per parquet scan leaf after an action ran."""

    def leaves(node):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            return leaves(node.executedPlan())
        if name.endswith("QueryStage"):  # AQE stage wrappers are leaves
            return leaves(node.plan())
        n = node.children().size() if hasattr(node, "children") else 0
        if n == 0:
            return [node]
        out = []
        for i in range(n):
            out.extend(leaves(node.children().apply(i)))
        return out

    stats = []
    for node in leaves(df._jdf.queryExecution().executedPlan()):
        if "Scan" not in node.nodeName():
            continue
        it = node.metrics().iterator()
        vals = {}
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        stats.append(vals)
    return stats


def _total_files(store) -> int:
    return sum(
        1
        for _, _, names in os.walk(store._data_path())
        for n in names
        if n.endswith(".parquet")
    )


@pytest.mark.slow
def test_point_lookup_reads_one_shard_constant_files(spark, tmp_path):
    from ftm_lakehouse_spark.lakehouse import Lakehouse
    from ftm_lakehouse_spark.model.statement import entity_shard
    from ftm_lakehouse_spark.operators.aggregate import assemble_entities

    ds = Lakehouse(spark, str(tmp_path)).dataset("pl", shards=8)
    rows = [
        {"id": f"ent{i}", "schema": "Person", "properties": {"name": [f"N{i}"]}}
        for i in range(400)
    ]
    ds.write_entities(spark.createDataFrame(rows), origin="bulk")
    ds.merge(force=True)
    total = _total_files(ds.store)
    assert total >= 8  # one+ file per shard — pruning has something to prune

    # the exact plan Dataset.get builds, kept as a DataFrame so the
    # executed metrics stay inspectable
    target = ds.store.live().filter(
        (F.col("shard") == entity_shard(F.lit("ent7"), ds.config.shards))
        & (F.col("entity_id") == "ent7")
    )
    out = assemble_entities(target)
    res = out.collect()
    assert len(res) == 1 and res[0]["entity_id"] == "ent7"

    scans = _scan_metrics(out)
    assert scans, "no parquet scan found in the executed plan"
    files_read = sum(int(s.get("numFiles", 0)) for s in scans)
    # shard partition pruning: EXACTLY one shard directory is planned
    # (files_read × shards == total because the merge writes each shard
    # evenly here). Within the shard, entity_id row-group min/max skip
    # bounds actual IO — files per shard is a write-parallelism choice,
    # not a lookup cost, so the pin is the pruning ratio, not "1 file".
    assert files_read * ds.config.shards <= total, (
        f"point lookup planned {files_read} of {total} files — "
        "more than one shard directory"
    )
    assert files_read < total
    # the entity_id predicate reached the parquet scan (row-group skip)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "ent7" in plan

    # the get() API itself returns the same entity
    ent = ds.get("ent7")
    assert ent is not None and ent["entity_id"] == "ent7"


def test_time_travel_guard_matches_all_missing_file_spellings():
    """Round-11 ADVICE: the pinned-version guard must map every
    spelling by which Spark surfaces a vacuumed file — the Spark 4
    errorClass, task-side java FileNotFoundException (possibly nested
    under a stage-failure wrapper), older AnalysisException phrasings —
    to the typed LogTruncated (HTTP 410), not a generic 500."""
    import pytest as _pytest

    from ftm_lakehouse_spark.lakehouse import Dataset
    from ftm_lakehouse_spark.sources.commits import LogTruncated

    spellings = [
        "[PATH_NOT_FOUND] Path does not exist: file:/x/part-0.parquet",
        "java.io.FileNotFoundException: File file:/x/part-0.parquet"
        " does not exist",
        "Path does not exist: s3a://lake/t/part-0.parquet",
        "No such file or directory: /x/part-0.parquet",
    ]
    for msg in spellings:
        with _pytest.raises(LogTruncated):
            Dataset._spark_time_travel_guard(3, Exception(msg))
    # nested cause chain (stage-failure wrapper around the java error)
    inner = Exception("java.io.FileNotFoundException: part-0.parquet")
    outer = Exception("Job aborted due to stage failure")
    outer.__cause__ = inner
    with _pytest.raises(LogTruncated):
        Dataset._spark_time_travel_guard(3, outer)
    # errorClass attribute (Spark 4 PySparkException surface)
    class _Exc(Exception):
        def getCondition(self):
            return "PATH_NOT_FOUND"
    with _pytest.raises(LogTruncated):
        Dataset._spark_time_travel_guard(3, _Exc("opaque"))
    # un-pinned reads and unrelated errors pass through untouched
    Dataset._spark_time_travel_guard(None, Exception(spellings[0]))
    Dataset._spark_time_travel_guard(3, Exception("divide by zero"))


def test_time_travel_guard_is_file_scoped():
    """Self-review follow-up: missing-BUCKET / missing-TABLE analysis
    errors also contain 'does not exist' but are transient/config
    server faults — they must NOT map to the permanent 410."""
    from ftm_lakehouse_spark.lakehouse import Dataset

    for msg in (
        "The specified bucket does not exist",
        "[TABLE_OR_VIEW_NOT_FOUND] The table or view `t` does not exist",
        "Database 'x' does not exist",
    ):
        Dataset._spark_time_travel_guard(3, Exception(msg))  # no raise


def test_time_travel_guard_verifies_before_410():
    """Round-12 ADVICE: a transient error that merely QUOTES a
    missing-file phrase (e.g. a wrapped retry error embedding an inner
    FileNotFoundException that later succeeds) must NOT become a
    permanent 410 when the commit-log check says the pinned snapshot's
    files are all still present — and a structured NON-file errorClass
    is authoritative: no text fallback at all."""
    import pytest as _pytest

    from ftm_lakehouse_spark.lakehouse import Dataset
    from ftm_lakehouse_spark.sources.commits import LogTruncated

    quoted = Exception(
        "retry budget exhausted; last attempt failed with inner error "
        "java.io.FileNotFoundException: part-0.parquet (will retry)"
    )
    # verify says the snapshot is intact -> retryable, no 410
    Dataset._spark_time_travel_guard(3, quoted, verify=lambda: False)
    # verify confirms vacuumed files -> 410
    with _pytest.raises(LogTruncated):
        Dataset._spark_time_travel_guard(3, quoted, verify=lambda: True)
    # no verifier wired (static/unit context): text match alone decides
    with _pytest.raises(LogTruncated):
        Dataset._spark_time_travel_guard(3, quoted)

    class _Structured(Exception):
        def getCondition(self):
            return "CAST_INVALID_INPUT"

    # structured non-file condition whose MESSAGE quotes a spelling:
    # authoritative, never a 410, verify not even consulted
    boom = _Structured("[CAST_INVALID_INPUT] ... path does not exist ...")
    Dataset._spark_time_travel_guard(
        3, boom, verify=lambda: (_ for _ in ()).throw(RuntimeError)
    )


def test_pinned_snapshot_vacuumed_commit_log_check(spark, tmp_path):
    """The guard's verifier against a real store: intact snapshot ->
    False; a referenced data file removed from storage -> True; a
    version behind log cleanup -> True (LogTruncated from replay)."""
    from ftm_lakehouse_spark.lakehouse import Lakehouse

    ds = Lakehouse(spark, str(tmp_path)).dataset("vac", shards=2)
    rows = [
        {"id": f"e{i}", "schema": "Person", "properties": {"name": [f"N{i}"]}}
        for i in range(20)
    ]
    ds.write_entities(spark.createDataFrame(rows), origin="bulk")
    ds.merge(force=True)
    v = ds.version
    assert ds._pinned_snapshot_vacuumed(v) is False

    # remove one referenced data file out from under the snapshot
    files = ds.store.commits.snapshot(v)
    assert files
    victim = ds._fs.join(ds.store._data_path(), files[0])
    assert ds._fs.exists(victim)
    ds._fs.delete(victim)
    assert ds._pinned_snapshot_vacuumed(v) is True


def test_time_travel_guard_spark4_task_side_condition():
    """Probed this round on Spark 4.1: a file vanishing AFTER plan
    resolution surfaces as Py4JJavaError, condition=None, message
    '[FAILED_READ_FILE.FILE_NOT_EXIST] ... File does not exist.' —
    caught by the text path today. If a future PySpark structures the
    condition, the authoritative branch must classify it as a missing
    file too (marker 'file_not_exist'), not return it as a non-file
    condition."""
    import pytest as _pytest

    from ftm_lakehouse_spark.lakehouse import Dataset
    from ftm_lakehouse_spark.sources.commits import LogTruncated

    # today's shape: unstructured, text-matched, verify-confirmed
    today = Exception(
        "[FAILED_READ_FILE.FILE_NOT_EXIST] Encountered error while "
        "reading file file:///x/part-0.parquet. File does not exist."
    )
    with _pytest.raises(LogTruncated):
        Dataset._spark_time_travel_guard(3, today, verify=lambda: True)

    # tomorrow's shape: the same condition, structured
    class _Structured(Exception):
        def getCondition(self):
            return "FAILED_READ_FILE.FILE_NOT_EXIST"

    with _pytest.raises(LogTruncated):
        Dataset._spark_time_travel_guard(3, _Structured("opaque"))
