import json

from pyspark.sql import functions as F


def test_delta_log_export_is_a_readable_delta_snapshot(spark, lake_root):
    from ftm_lakehouse_spark.lakehouse import Lakehouse
    from ftm_lakehouse_spark.model.statement import STATEMENT_SCHEMA
    from ftm_lakehouse_spark.sources.delta_export import export_delta_log
    from tests.test_lakehouse import JANE, entities_df

    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("deltaexp")
    ds.write_entities(entities_df(spark, JANE), origin="bulk")
    ds.merge()
    store = ds.store

    log_path = export_delta_log(store)
    lines = [json.loads(l) for l in open(log_path) if l.strip()]

    protos = [l["protocol"] for l in lines if "protocol" in l]
    metas = [l["metaData"] for l in lines if "metaData" in l]
    adds = [l["add"] for l in lines if "add" in l]
    assert len(protos) == 1 and protos[0]["minReaderVersion"] == 1
    assert len(metas) == 1
    # schemaString round-trips to the exact statement schema
    from pyspark.sql.types import StructType
    assert StructType.fromJson(json.loads(metas[0]["schemaString"])) == STATEMENT_SCHEMA
    assert metas[0]["partitionColumns"] == ["shard", "bucket", "origin"]
    # the add set IS the MVCC snapshot, with real sizes and partition values
    assert sorted(a["path"] for a in adds) == sorted(store.commits.snapshot())
    data = store._data_path()
    for a in adds:
        assert a["size"] == store._fs.filesize(store._fs.join(data, a["path"]))
        assert set(a["partitionValues"]) == {"shard", "bucket", "origin"}
    # a generic Delta reader reconstructs the table from the log alone:
    # reading exactly the add paths reproduces store.raw()
    paths = [store._fs.join(data, a["path"]) for a in adds]
    df = spark.read.schema(STATEMENT_SCHEMA).parquet(*paths)
    assert df.count() == store.raw().count()
    # idempotent re-export after maintenance reflects the new snapshot
    ds.write_entities(entities_df(spark, JANE), origin="bulk2")
    export_delta_log(store)
    lines2 = [json.loads(l) for l in open(log_path) if l.strip()]
    adds2 = [l["add"]["path"] for l in lines2 if "add" in l]
    assert sorted(adds2) == sorted(store.commits.snapshot())
    assert len(adds2) > len(adds)
    # and vacuum never reaps the published log (non-parquet is invisible
    # to the untracked sweep)
    store.vacuum(retention_hours=0.0)
    assert store._fs.exists(log_path)
