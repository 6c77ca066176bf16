"""Stream-stream interval join: bounded-state attribution."""

import time
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


def test_interval_join_left_outer_flushes_unmatched(spark, tmp_path):
    """Left-outer face: unmatched clicks must emit with NULL purchase
    once the watermark proves no match can arrive. One CONTINUOUS
    micro-batch query with files fed while it runs — the watermark's
    max-event-time tracker is in-memory, so only later batches of the
    same run can advance it (an availableNow restart would replan from
    the checkpointed watermark and never flush)."""
    c, p = _frames(spark)
    cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
    ckpt = str(tmp_path / "ckpt")
    c.write.parquet(cdir)
    p.write.parquet(pdir)

    cs = spark.readStream.schema(c.schema).parquet(cdir)
    ps = spark.readStream.schema(p.schema).parquet(pdir)
    q = (
        interval_join(cs, ps, horizon="30 minutes", how="left_outer")
        .select(
            F.col("l.event_id").alias("click"),
            F.col("r.event_id").alias("purchase"),
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib_outer")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        def sink():
            return {
                (r["click"], r["purchase"])
                for r in spark.sql("SELECT * FROM attrib_outer").collect()
            }

        deadline = time.time() + 90
        while (1, 11) not in sink() and time.time() < deadline:
            time.sleep(0.5)
        # the global watermark is the MIN across both inputs
        # (multipleWatermarkPolicy=min), so BOTH streams need a
        # far-future sentinel before unmatched state can flush; the
        # sentinels use disjoint users so they match nothing
        spark.createDataFrame(
            [(98, 998, _ts(0).replace(hour=12))], ["event_id", "user_id", "ts"]
        ).write.mode("append").parquet(cdir)
        spark.createDataFrame(
            [(99, 999, _ts(0).replace(hour=12))], ["event_id", "user_id", "ts"]
        ).write.mode("append").parquet(pdir)
        # sentinel click 98 itself stays in state (watermark 11:50 never
        # passes its own 12:30 horizon) — exactly the 4 rows must land
        want = {(1, 11), (2, None), (3, None), (4, None)}
        while sink() != want and time.time() < deadline:
            time.sleep(0.5)
        assert sink() == want
    finally:
        q.stop()
