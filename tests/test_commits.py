"""CommitLog: file-level incremental reads behind the version cursor
(the Delta-transaction-log contract on plain parquet, honestly scoped:
appends travel file-exact; rewrites fall back to a pruned scan)."""

from ftm_lakehouse_spark.lakehouse import Lakehouse

from .test_lakehouse import ACME, JANE, PAY, entities_df


def test_append_commits_record_files(spark, lake_root):
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("cl")
    assert ds.store.commits.current_version() == 0

    ds.write_entities(entities_df(spark, JANE), origin="a")
    assert ds.store.commits.current_version() == 1
    ds.write_entities(entities_df(spark, ACME), origin="b")
    assert ds.store.commits.current_version() == 2

    recs = ds.store.commits.read()
    assert [r["kind"] for r in recs] == ["append", "append"]
    assert all(r["files_added"] for r in recs)
    assert all(f.endswith(".parquet") for r in recs for f in r["files_added"])
    # partition provenance is embedded in the recorded paths
    assert all("origin=a" in f for f in recs[0]["files_added"])
    assert all("origin=b" in f for f in recs[1]["files_added"])


def test_raw_since_reads_only_new_files(spark, lake_root):
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("cl2")
    ds.write_entities(entities_df(spark, JANE), origin="a")
    v1 = ds.store.commits.current_version()
    ds.write_entities(entities_df(spark, ACME, PAY), origin="b")

    full = ds.store.raw()
    inc = ds.store.raw_since(v1)
    # incremental slice is exactly the second batch
    assert inc.count() == full.filter("origin = 'b'").count()
    assert inc.select("origin").distinct().collect()[0]["origin"] == "b"
    # partition columns recovered from file paths (basePath)
    assert set(inc.columns) == set(full.columns)
    # since-0 covers everything
    assert ds.store.raw_since(0).count() == full.count()
    # nothing after the latest version
    assert ds.store.raw_since(ds.store.commits.current_version()).count() == 0


def test_rewrite_invalidates_appended_files(spark, lake_root):
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("cl3")
    ds.write_entities(entities_df(spark, JANE), origin="a")
    v1 = ds.store.commits.current_version()
    ds.write_entities(entities_df(spark, JANE), origin="a")  # dup → dirty
    assert ds.merge() is True

    recs = ds.store.commits.read()
    assert recs[-1]["kind"] == "rewrite"

    files, rewritten = ds.store.commits.files_since(v1)
    # the appended files under the rewritten partition are invalidated
    assert files == []
    assert rewritten
    # the fallback scan returns the canonical (merged) rows
    inc = ds.store.raw_since(v1)
    assert inc.count() == ds.store.raw().count()
    # a later untouched-partition append stays file-exact
    v3 = ds.store.commits.current_version()
    ds.write_entities(entities_df(spark, ACME), origin="c")
    files2, rewritten2 = ds.store.commits.files_since(v3)
    assert files2 and not rewritten2
    assert ds.store.raw_since(v3).count() == ds.store.raw().filter("origin='c'").count()


def test_vacuum_reaps_orphaned_stage(spark, lake_root):
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("cl4")
    ds.write_entities(entities_df(spark, JANE), origin="a")
    # simulate a crash between stage write and swap
    orphan = ds.store._fs.join(ds.store.path, "_stage-123456")
    ds.store._fs.mkdirs(orphan)
    assert ds.store.vacuum() == ["_stage-123456"]
    assert not ds.store._fs.exists(orphan)
    assert ds.store.vacuum() == []
    assert ds.count() == 1  # data untouched


def test_canonical_since_incremental_entities(spark, lake_root):
    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("cl5")
    ds.write_entities(entities_df(spark, JANE), origin="a")
    ds.merge()
    v = ds.store.commits.current_version()
    ds.write_entities(entities_df(spark, ACME, PAY), origin="b")
    got = ds.store.canonical_since(v)
    ids = {r["entity_id"] for r in got.select("entity_id").distinct().collect()}
    assert ids == {"acme", "pay1"}  # jane untouched since the cursor
