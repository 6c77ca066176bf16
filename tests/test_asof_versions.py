"""As-of join semantics + version store."""

from datetime import datetime

from ftm_lakehouse_spark.operators.asof import asof_join, asof_join_pandas
from ftm_lakehouse_spark.sources.versions import VersionStore


def ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", ts("2024-01-01T10:00:05"), 100.0),
            (2, "A", ts("2024-01-01T10:00:01"), 101.0),
            (3, "B", ts("2024-01-01T10:00:03"), 200.0),
            (4, "B", ts("2024-01-01T09:59:59"), 201.0),
        ],
        ["trade_id", "sym", "ts", "price"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", ts("2024-01-01T10:00:00"), 99.0),
            ("A", ts("2024-01-01T10:00:04"), 99.5),
            ("B", ts("2024-01-01T10:00:02"), 198.0),
        ],
        ["sym", "ts", "bid"],
    )
    return trades, quotes


def expected():
    return {
        1: 99.5,  # latest A quote at/before 10:00:05
        2: 99.0,
        3: 198.0,
        4: None,  # no B quote before 09:59:59
    }


def test_asof_join_window_form(spark):
    trades, quotes = _frames(spark)
    out = {r["trade_id"]: r["bid_right"] for r in
           asof_join(trades, quotes, on="sym", ts="ts", right_payload=["bid"]).collect()}
    assert out == expected()


def test_asof_join_pandas_form(spark):
    trades, quotes = _frames(spark)
    out = {r["trade_id"]: r["bid_right"] for r in
           asof_join_pandas(trades, quotes, on="sym", ts="ts", right_payload=["bid"]).collect()}
    assert out == expected()


def test_asof_equal_ts_matches(spark):
    # at-or-before: a right row AT the left ts matches
    l = spark.createDataFrame([(1, "A", ts("2024-01-01T10:00:00"))], ["i", "k", "ts"])
    r = spark.createDataFrame([("A", ts("2024-01-01T10:00:00"), 5.0)], ["k", "ts", "v"])
    out = asof_join(l, r, on="k", ts="ts", right_payload=["v"]).collect()
    assert out[0]["v_right"] == 5.0


def test_version_store(tmp_path):
    vs = VersionStore(str(tmp_path))
    v1 = vs.put("stats", {"n": 1})
    assert v1 is not None
    # identical artifact → deduped
    assert vs.put("stats", {"n": 1}) is None
    v2 = vs.put("stats", {"n": 2})
    assert v2 is not None and v2 != v1
    latest = vs.latest("stats")
    assert latest["artifact"] == {"n": 2}
    assert vs.history("stats") == sorted([v1, v2])
    assert vs.latest("missing") is None


def test_proximity_join_exact(spark):
    from ftm_lakehouse_spark.operators.range_join import proximity_join

    l = spark.createDataFrame(
        [(1, "u", ts("2024-01-01T10:00:00")), (2, "u", ts("2024-01-01T12:00:00"))],
        ["lid", "k", "ts"],
    )
    r = spark.createDataFrame(
        [
            ("u", ts("2024-01-01T10:04:59"), "near"),
            ("u", ts("2024-01-01T10:05:01"), "far"),   # 301s > 300s
            ("u", ts("2024-01-01T09:55:30"), "before"),
            ("v", ts("2024-01-01T10:00:00"), "otherkey"),
        ],
        ["k", "ts", "tag"],
    )
    out = proximity_join(l, r, on="k", ts="ts", max_delta_s=300).collect()
    tags = sorted(x["tag_right"] for x in out)
    assert tags == ["before", "near"]


def test_point_in_interval_join(spark):
    from ftm_lakehouse_spark.operators.range_join import point_in_interval_join

    pts = spark.createDataFrame(
        [(1, ts("2024-01-01T10:30:00")), (2, ts("2024-01-01T13:00:00"))],
        ["pid", "t"],
    )
    ivs = spark.createDataFrame(
        [
            ("morning", ts("2024-01-01T09:00:00"), ts("2024-01-01T12:00:00")),
            ("noonish", ts("2024-01-01T10:00:00"), ts("2024-01-01T11:00:00")),
        ],
        ["name", "s", "e"],
    )
    out = point_in_interval_join(pts, ivs, "t", "s", "e", bucket_s=3600).collect()
    got = sorted((r["pid"], r["name_iv"]) for r in out)
    assert got == [(1, "morning"), (1, "noonish")]
