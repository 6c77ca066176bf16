"""Bucketed-table writer: pre-shuffle a table ONCE at write time so
every later equi-join/aggregation on the bucket key runs shuffle-free.

This is the parquet-native co-location strategy for the 100 TB case:
a fact table bucketed on its join key meets a dimension bucketed with
the SAME bucket count in a SortMergeJoin with **no Exchange on either
side** — the one-time write shuffle is amortized over every downstream
query. (The reference gets per-partition locality from its DuckDB file
layout; Spark's analog is the catalog-tracked bucketed table, which
Catalyst recognizes via output partitioning.)

Rules that make bucket pruning/co-location actually fire:
  * both sides must use the SAME bucket count (or a divisor with
    ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
  * the join key must be exactly the bucket column set;
  * ``sortBy`` on the key additionally removes the per-task Sort
    before SortMergeJoin.

Bucketed tables require the session catalog (``saveAsTable``) — a
plain ``.parquet(path)`` write drops the bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a catalog-tracked bucketed parquet table.

    ``buckets`` should be sized so one bucket of the LARGEST table
    fits an executor core's working set (at 100 TB / 4096 buckets ≈
    25 GB per bucket per table — scale the count with the data, it is
    the join parallelism floor)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count catalog tables on their bucket key.

    When both tables were written by :func:`write_bucketed` with the
    same ``buckets``, the physical plan is a SortMergeJoin with zero
    Exchange operators — verify with ``.explain()``; pinned by
    ``tests/test_bucketed.py``."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
