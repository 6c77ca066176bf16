"""Skew-resistant aggregation: two-phase salted groupBy.

AQE's skew-join handling covers joins; heavily skewed *aggregations*
(count-distinct per hot key, collect-style folds) still bottleneck on
the one reducer owning the hot key. The classic fix: salt the key into
``num_salts`` sub-keys, pre-aggregate per (key, salt), then combine —
two small shuffles instead of one skewed one.

Works for any algebraic aggregate (sum/count/min/max); for distinct
counting use :func:`salted_count_distinct`, which stays exact by
hash-partitioning the *distinct value* into the salt (every duplicate
of a value lands in the same salt bucket, so bucket-distincts sum).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_count_distinct"]


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation.

    ``aggs`` maps output name → (partial_agg_expr, combine_agg_expr),
    e.g. ``{"n": (F.count("*"), F.sum("n")), "mx": (F.max("v"), F.max("mx"))}``.
    """
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(num_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[combine.alias(name) for name, (_, combine) in aggs.items()]
    )


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    num_salts: int = 16,
    out: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per key without a single hot reducer:
    salt = hash(value) % num_salts, so all duplicates of one value meet
    in one bucket; per-bucket exact distincts then SUM."""
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(value)), F.lit(num_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.countDistinct(value).alias("_partial")
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(out))
