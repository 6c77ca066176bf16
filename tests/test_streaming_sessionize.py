"""Streaming sessionization: native session_window aggregates and the
applyInPandasWithState custom stateful operator, verified against
hand-computed session boundaries (and, for the native form, against
the batch lag-gap formulation that the w_sessionize oracle pins)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from ftm_lakehouse_spark.streaming.sessionize import (
    session_window_stats,
    sessionize_stateful,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _events(spark):
    """user 1: two sessions (gap 40 min between event 2 and 3);
    user 2: one session."""
    rows = [
        (1, T0),
        (1, T0 + timedelta(minutes=10)),
        (1, T0 + timedelta(minutes=50)),   # > 30 min after previous → new
        (1, T0 + timedelta(minutes=55)),
        (2, T0 + timedelta(minutes=5)),
        (2, T0 + timedelta(minutes=20)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_session_window_batch_semantics(spark):
    out = (
        session_window_stats(_events(spark), gap="30 minutes")
        .orderBy("user_id", "session_start")
        .collect()
    )
    assert [(r["user_id"], r["n_events"]) for r in out] == [(1, 2), (1, 2), (2, 2)]
    # session bounds are the observed event extremes
    assert out[0]["session_start"] == T0
    assert out[0]["session_end"] == T0 + timedelta(minutes=10)
    assert out[1]["session_start"] == T0 + timedelta(minutes=50)


def test_session_window_agrees_with_lag_gap_form(spark):
    """The native gap-merge must produce exactly as many sessions per
    user as the batch lag-gap running count (the oracle-pinned
    w_sessionize semantics)."""
    ev = _events(spark)
    native = (
        session_window_stats(ev, gap="30 minutes")
        .groupBy("user_id")
        .count()
        .collect()
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    lagged = (
        ev.withColumn(
            "new_session",
            F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"))
        .collect()
    )
    assert {r["user_id"]: r["count"] for r in native} == {
        r["user_id"]: r["n_sessions"] for r in lagged
    }


def test_stateful_sessionizer_stream(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    _events(spark).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    q = (
        sessionize_stateful(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql(
        "SELECT * FROM sessions ORDER BY user_id, session_seq, closed"
    ).collect()
    by_key = {(r["user_id"], r["session_seq"]): r for r in rows}
    # user 1 session 0 closed with 2 events; session 1 still open with 2
    assert by_key[(1, 0)]["closed"] is True
    assert by_key[(1, 0)]["n_events"] == 2
    assert by_key[(1, 1)]["closed"] is False
    assert by_key[(1, 1)]["n_events"] == 2
    # user 2: one open session of 2 events
    assert by_key[(2, 0)]["closed"] is False
    assert by_key[(2, 0)]["n_events"] == 2
    # microsecond bounds match the event extremes
    import calendar

    t0_us = int(calendar.timegm(T0.timetuple())) * 1_000_000
    assert by_key[(1, 0)]["start_us"] == t0_us
    assert by_key[(1, 0)]["end_us"] == t0_us + 10 * 60 * 1_000_000


def test_windowed_agg_stream_equals_batch(spark, tmp_path):
    """Watermarked tumbling-window aggregation: the same groupBy(
    F.window(...)) plan run under readStream must produce exactly the
    batch answer once the stream drains (the stream==batch contract
    behind the w_tumbling_window gate)."""
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt_win")
    _events(spark).write.mode("overwrite").parquet(src)

    def windowed(df):
        return df.groupBy(F.window("ts", "30 minutes").alias("w")).agg(
            F.count("*").alias("n_events")
        )

    batch = {
        (r["w"]["start"], r["w"]["end"]): r["n_events"]
        for r in windowed(spark.read.parquet(src)).collect()
    }

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    q = (
        windowed(stream.withWatermark("ts", "1 hour"))
        .writeStream.format("memory")
        .queryName("win_agg")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    streamed = {
        (r["w"]["start"], r["w"]["end"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    assert streamed == batch and len(batch) >= 2
