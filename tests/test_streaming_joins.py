"""Stream-stream interval join: bounded-state attribution."""

from datetime import datetime

from pyspark.sql import functions as F

from ftm_lakehouse_spark.streaming.joins import interval_join


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 0, minute, second)


def _frames(spark):
    clicks = [
        (1, 100, _ts(0)),
        (2, 100, _ts(40)),   # second click, outside first purchase window
        (3, 200, _ts(5)),
        (4, 300, _ts(10)),   # user with no purchase
    ]
    purchases = [
        (11, 100, _ts(20)),  # within 30m of click 1 only
        (12, 200, _ts(36)),  # 31m after click 3 → outside horizon
    ]
    c = spark.createDataFrame(clicks, ["event_id", "user_id", "ts"])
    p = spark.createDataFrame(purchases, ["event_id", "user_id", "ts"])
    return c, p


def test_interval_join_batch_semantics(spark):
    c, p = _frames(spark)
    out = interval_join(c, p, horizon="30 minutes").select(
        F.col("l.event_id").alias("click"), F.col("r.event_id").alias("purchase")
    ).collect()
    assert {(r["click"], r["purchase"]) for r in out} == {(1, 11)}


def test_interval_join_streaming_matches_batch(spark, tmp_path):
    c, p = _frames(spark)
    cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
    c.write.parquet(cdir)
    p.write.parquet(pdir)

    cs = spark.readStream.schema(c.schema).parquet(cdir)
    ps = spark.readStream.schema(p.schema).parquet(pdir)
    q = (
        interval_join(cs, ps, horizon="30 minutes")
        .select(
            F.col("l.event_id").alias("click"),
            F.col("r.event_id").alias("purchase"),
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM attrib").collect()
    assert {(r["click"], r["purchase"]) for r in rows} == {(1, 11)}
