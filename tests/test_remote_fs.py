"""S16 remote storage: the full lakehouse lifecycle over a Hadoop
FileSystem URI root. ``file://`` runs the IDENTICAL HadoopFS code path
(JVM FileSystem.get + Path ops) that s3a/gs/hdfs roots use on a
cluster with the jars — data plane through Spark's readers/writers,
control plane (tags, config, versions, stage-and-swap) through
sources/fs.HadoopFS."""

from datetime import datetime, timedelta, timezone

from ftm_lakehouse_spark.lakehouse import Lakehouse
from ftm_lakehouse_spark.plans.query import Query
from ftm_lakehouse_spark.sources.fs import HadoopFS, LocalFS, get_fs

from .test_lakehouse import ACME, JANE, PAY, entities_df


def test_get_fs_dispatch(spark, tmp_path):
    assert isinstance(get_fs(str(tmp_path)), LocalFS)
    assert isinstance(get_fs(f"file://{tmp_path}", spark), HadoopFS)


def test_hadoop_fs_primitives(spark, tmp_path):
    fs = get_fs(f"file://{tmp_path}", spark)
    base = f"file://{tmp_path}/ctrl"
    fs.mkdirs(fs.join(base, "sub"))
    assert fs.isdir(fs.join(base, "sub"))
    fs.write_text_atomic(fs.join(base, "a.json"), '{"k": 1}')
    assert fs.read_text(fs.join(base, "a.json")) == '{"k": 1}'
    # overwrite via the same atomic path
    fs.write_text_atomic(fs.join(base, "a.json"), '{"k": 2}')
    assert fs.read_text(fs.join(base, "a.json")) == '{"k": 2}'
    assert fs.listdir(base) == ["a.json", "sub"]
    fs.rename(fs.join(base, "sub"), fs.join(base, "moved"))
    assert fs.isdir(fs.join(base, "moved")) and not fs.exists(fs.join(base, "sub"))
    fs.delete(fs.join(base, "a.json"))
    assert not fs.exists(fs.join(base, "a.json"))
    assert fs.listdir(fs.join(base, "nope")) == []


def test_lifecycle_over_file_uri(spark, tmp_path):
    """write → merge (stage-and-swap over HadoopFS rename) → query →
    delete → diff, all rooted at a URI."""
    root = f"file://{tmp_path}/lake"
    lake = Lakehouse(spark, root)
    ds = lake.dataset("donations")
    assert isinstance(ds.store._fs, HadoopFS)

    ds.write_entities(entities_df(spark, JANE, ACME, PAY), origin="bulk")
    assert ds.count() == 3

    # merge exercises overwrite_partitions' swap through JVM renames
    assert ds.merge() is True
    assert ds.count() == 3
    janes = ds.entities(Query().where(name="Jane Doe")).collect()
    assert len(janes) == 1 and janes[0]["entity_id"] == "jane"

    # tags + versions sidecars landed under the URI root
    assert ds.store.tags.get("last_updated") is not None
    assert ds.store.tags.get("last_optimized") is not None

    since = datetime.now(timezone.utc) - timedelta(days=1)
    ds.delete_entity("jane")
    ops = {r["op"]: r for r in ds.diff(since).collect()}
    assert "DEL" in ops or "MOD" in ops  # jane tombstoned post-merge

    # catalog surface over the URI root
    assert lake.list_datasets() == ["donations"]
    lake.drop_dataset("donations")
    assert lake.list_datasets() == []


def test_merge_reaps_tombstoned_partition_over_uri(spark, tmp_path):
    """The expected-partition cleanup branch (fully-reaped partition
    directory removed) must work through the FS shim too."""
    root = f"file://{tmp_path}/lake2"
    lake = Lakehouse(spark, root)
    ds = lake.dataset("d1")
    ds.write_entities(entities_df(spark, JANE), origin="bulk")
    ds.merge()
    ds.delete_entity("jane")
    # grace 0 → tombstone reaped; jane's partition produces no output
    ds.merge(grace_days=0)
    assert ds.count() == 0


def test_exclusive_write_distinguishes_race_from_failure(spark, tmp_path):
    """A rename that fails with NO competing destination is a real
    error (permissions/quota/IO), not a lost version race — it must
    raise, not burn 64 retries as phantom contention (round-2 ADVICE,
    low). A rename refused because the destination EXISTS is the
    genuine race and still returns False."""
    import pytest

    from ftm_lakehouse_spark.sources.fs import HadoopFS

    root = f"file://{tmp_path}/xw"
    hfs = HadoopFS(root, spark)
    hfs.mkdirs(root)
    target = hfs.join(root, "0001.json")
    assert hfs.write_text_exclusive(target, "a") is True

    class _RenameAlwaysFails:
        def __init__(self, inner):
            self._inner = inner

        def rename(self, src, dst):
            return False

        def __getattr__(self, name):
            return getattr(self._inner, name)

    hfs._fs = _RenameAlwaysFails(hfs._fs)
    # destination exists → lost race, False
    assert hfs.write_text_exclusive(target, "b") is False
    # destination absent → persistent failure, surfaced as the error it is
    with pytest.raises(OSError, match="not a version race"):
        hfs.write_text_exclusive(hfs.join(root, "0002.json"), "c")


def test_read_chunks_matches_read_bytes(spark, tmp_path):
    """Chunked reads (the checksum path for large artifacts) must
    reproduce read_bytes exactly on both FS shims, including the
    short-final-chunk boundary."""
    import os

    data = os.urandom(3 * 1024 + 17)  # deliberately not chunk-aligned
    p = str(tmp_path / "blob.bin")
    with open(p, "wb") as fh:
        fh.write(data)

    lfs = LocalFS()
    assert b"".join(lfs.read_chunks(p, chunk_size=1024)) == data

    hfs = HadoopFS(f"file://{tmp_path}", spark)
    hp = hfs.join(f"file://{tmp_path}", "blob.bin")
    assert b"".join(hfs.read_chunks(hp, chunk_size=1024)) == data
    assert hfs.read_bytes(hp) == data
