"""Range (proximity/interval) join via bucketization.

Spark executes a raw inequality join as BroadcastNestedLoopJoin —
O(n·m) and driver-bound. The scalable form quantizes the range key into
buckets: a row can only match rows in its own or adjacent buckets, so
an equi-join on (key, bucket) + a residual filter finds every pair
while shuffling on a compound key. This is the standard trick for
"events within Δt of each other" / point-in-interval joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["proximity_join", "point_in_interval_join"]


def proximity_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    max_delta_s: int,
    suffix: str = "_right",
) -> DataFrame:
    """Pairs (l, r) sharing ``on`` with |l.ts - r.ts| <= max_delta_s.

    Bucket width = max_delta_s, so candidates live in buckets
    {b-1, b, b+1}; the left side explodes into the 3 probe buckets and
    equi-joins the right side's home bucket — shuffle on (key, bucket),
    never a nested loop.
    """
    bucket = lambda c: F.floor(F.unix_micros(c) / F.lit(max_delta_s * 1_000_000))
    lcols = left.columns
    rcols = right.columns

    l = left.select(
        F.struct(*lcols).alias("_l"),
        F.col(on).alias("_k"),
        F.col(ts).alias("_lts"),
        F.explode(
            F.array(bucket(F.col(ts)) - 1, bucket(F.col(ts)), bucket(F.col(ts)) + 1)
        ).alias("_b"),
    )
    r = right.select(
        F.struct(*rcols).alias("_r"),
        F.col(on).alias("_k"),
        F.col(ts).alias("_rts"),
        bucket(F.col(ts)).alias("_b"),
    )
    joined = l.join(r, ["_k", "_b"]).filter(
        F.abs(F.unix_micros("_lts") - F.unix_micros("_rts"))
        <= F.lit(max_delta_s * 1_000_000)
    )
    return joined.select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col("_r")[c].alias(f"{c}{suffix}") for c in rcols],
    ).dropDuplicates(
        # a pair can match in at most one right-home bucket, but keep
        # the explicit dedupe for safety with boundary-equal timestamps
        [*lcols, *[f"{c}{suffix}" for c in rcols]]
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_s: int,
    on: str | None = None,
    suffix: str = "_iv",
) -> DataFrame:
    """Point-in-interval join: each point row joined to every interval
    containing it. Intervals explode into the buckets they span
    (bounded by interval length / bucket_s); points probe their single
    bucket."""
    pcols = points.columns
    icols = intervals.columns
    b = lambda c: F.floor(F.unix_micros(c) / F.lit(bucket_s * 1_000_000))

    iv = intervals.select(
        F.struct(*icols).alias("_iv"),
        *( [F.col(on).alias("_k")] if on else [] ),
        F.col(start_ts).alias("_s"),
        F.col(end_ts).alias("_e"),
        F.explode(F.sequence(b(F.col(start_ts)), b(F.col(end_ts)))).alias("_b"),
    )
    pt = points.select(
        F.struct(*pcols).alias("_p"),
        *( [F.col(on).alias("_k")] if on else [] ),
        F.col(point_ts).alias("_t"),
        b(F.col(point_ts)).alias("_b"),
    )
    keys = ["_k", "_b"] if on else ["_b"]
    joined = pt.join(iv, keys).filter(
        (F.col("_t") >= F.col("_s")) & (F.col("_t") < F.col("_e"))
    )
    return joined.select(
        *[F.col("_p")[c].alias(c) for c in pcols],
        *[F.col("_iv")[c].alias(f"{c}{suffix}") for c in icols],
    )
