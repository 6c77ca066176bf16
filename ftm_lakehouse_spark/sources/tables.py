"""Loaders for the driver-provided benchmark tables.

``/root/testdata/sf*/`` holds a TPC-H-ish star schema plus ``events``
(ns-timestamp stream table), ``documents`` (text corpus) and
``embeddings`` (vector corpus). See /root/repo/TESTDATA.md.

The only normalization applied is ``events.ts``: the file stores
parquet TIMESTAMP(NANOS), which Spark reads (under
``spark.sql.legacy.parquet.nanosAsLong``) as a long of nanoseconds.
We convert to a microsecond UTC timestamp so Spark results compare
1:1 with DuckDB (which casts ns → µs the same truncating way).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs (truncating, matching DuckDB's CAST(ts_ns AS TIMESTAMP))
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    """Register each table as a temp view for ``spark.sql`` queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
