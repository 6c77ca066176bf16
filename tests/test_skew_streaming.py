"""Salted aggregation exactness + streaming windowed stats."""

from pyspark.sql import functions as F


def test_salted_count_distinct_exact(spark):
    from ftm_lakehouse_spark.operators.skew import salted_count_distinct

    # hot key: one key owns 90% of rows
    rows = [("hot", f"v{i % 37}") for i in range(900)] + [
        (f"k{i}", f"v{i}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(df, ["k"], "v", num_salts=8).collect()
    }
    assert got["hot"] == 37
    assert got["k5"] == 1
    # cross-check vs the unsalted plan
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == exact


def test_salted_agg_matches_plain(spark):
    from ftm_lakehouse_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("a", i % 7) for i in range(500)] + [("b", i) for i in range(50)],
        ["k", "v"],
    )
    got = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": (F.count("*"), F.sum("n")),
                "total": (F.sum("v"), F.sum("total")),
                "mx": (F.max("v"), F.max("mx")),
            },
        ).collect()
    }
    plain = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == plain


def test_streaming_windowed_stats(spark, tmp_path):
    from ftm_lakehouse_spark.model.dataset import DatasetConfig
    from ftm_lakehouse_spark.sources.statement_store import StatementStore
    from ftm_lakehouse_spark.streaming.journal import StreamingJournal

    from .helpers import make_df, stmt

    src = str(tmp_path / "in")
    rows = [
        stmt(id=f"s{i}", entity_id=f"e{i % 3}", last_seen="2024-01-01T00:00:30")
        for i in range(6)
    ] + [stmt(id="late", entity_id="e9", schema="Company", last_seen="2024-01-01T00:07:00")]
    make_df(spark, rows).write.parquet(src)

    store = StatementStore(spark, str(tmp_path / "store"), DatasetConfig(name="w"))
    j = StreamingJournal(spark, store, src, str(tmp_path / "ckpt"))
    q = (
        j.windowed_stats(window="5 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_stats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM win_stats").collect()
    assert len(out) == 2  # two 5-minute windows
    by_schema = {(r["schema"], r["window"]["start"].minute): r["n_statements"] for r in out}
    assert by_schema[("Person", 0)] == 6
    assert by_schema[("Company", 5)] == 1


def test_approx_stats_error_bounds(spark):
    """x_approx_stats became FULL-oracle in round 5 (KMV distinct +
    deterministic 10%-sample percentiles — value-hash-graded against
    DuckDB), so cross-engine equality is already pinned by the gate.
    This test pins the other axis the oracle cannot: the estimators
    stay within their theoretical error of the EXACT answers.

    KMV with k=64 minima has relative standard error 1/sqrt(k-2)
    ≈ 12.7%; the estimate is a deterministic function of the data (md5
    order statistics), so per-dataset error is fixed — allow 3σ.
    Percentiles come from a 10% deterministic hash sample: a q-quantile
    of an n·p sample deviates from the population quantile by
    O(sqrt(q(1-q)/(n·p))) in RANK; allow the corresponding value slack
    via the p50–p95 spread."""
    import pyspark.sql.functions as F

    from ftm_lakehouse_spark.queries.inventory import QUERIES

    sf = "/root/testdata/sf0.01"
    approx = {
        r["event_type"]: r
        for r in QUERIES["x_approx_stats"][0](spark, sf).collect()
    }
    from ftm_lakehouse_spark.sources.tables import load_table

    ev = load_table(spark, sf, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for et, a in approx.items():
        e = exact[et]
        assert a["n"] == e["n"]  # plain count rides along exactly
        # KMV k=64: 3σ = 3/sqrt(62) ≈ 38% relative
        assert abs(a["approx_users"] - e["users"]) <= max(5, 0.381 * e["users"])
        # 10% sample quantiles: the sample emits an observed value, not
        # an interpolation — compare loosely via the p50–p95 spread
        spread = e["p95"] - e["p50"] or 1.0
        assert abs(a["p50"] - e["p50"]) <= 0.15 * spread
        assert abs(a["p95"] - e["p95"]) <= 0.15 * spread


def test_approx_count_distinct_error_bounds(spark):
    """HLL++ distinct sketch: the scale path for cardinality when even
    salted exact count-distinct is too expensive (one pass, constant
    memory per group). Pin relative error vs exact on the events
    table — rsd=0.02 must land within 5%."""
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    row = e.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
    # grouped form: every event_type within bounds too
    rows = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling must actually fire for a hot-key join —
    the runtime half of the skew story (operators/skew.py is the
    compile-time half). One key owning ~95% of the left side gets its
    shuffle partition split into multiple tasks; the executed plan
    marks the join 'skew=true'."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            # unset by default (falls back to the static threshold) —
            # saved as None, restored via unset
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        # shrink thresholds so local test data counts as skewed, and
        # forbid broadcast so the join actually shuffles — BOTH the
        # static planner threshold and AQE's runtime one (the session
        # raises both to 64m; AQE would otherwise convert the SMJ to a
        # broadcast join mid-flight and no skew split could fire)
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), F.col("id")))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(50).select(
            F.when(F.col("id") == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), F.col("id")))
            .alias("k"),
            F.col("id").alias("attr"),
        )
        joined = left.join(right, "k")
        # collect() executes THIS dataframe's own QueryExecution
        # (count()/write wrap it in a fresh one and leave this plan
        # un-finalized at isFinalPlan=false)
        assert len(joined.collect()) == 190_002  # 190k hot + k20/k40 cold
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
