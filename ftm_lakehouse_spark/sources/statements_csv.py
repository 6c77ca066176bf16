"""statements.csv import/export codec (reference S9/S10:
helpers/statements.py:147-179 reader; model/statement.py:90-123 columns).

The CSV wire format is the 15-column FtM statement CSV plus the
lakehouse ``fragment`` column; ``canonical_id`` is dropped on import
(always equals ``entity_id``), timestamps are ISO-8601 UTC, ``external``
serializes as true/false. ``prop_type`` is recomputed and ``lang``
nulled for non-linguistic types on import — input claims are not
trusted (reference explode.py:190-194).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ftm_lakehouse_spark.model.statement import STATEMENT_COLUMNS, entity_shard, schema_bucket
from ftm_lakehouse_spark.operators.explode import LINGUISTIC_TYPES, prop_type

CSV_READ_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("canonical_id", T.StringType(), True),
        T.StructField("prop", T.StringType(), False),
        T.StructField("prop_type", T.StringType(), True),
        T.StructField("schema", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
        T.StructField("original_value", T.StringType(), True),
        T.StructField("dataset", T.StringType(), True),
        T.StructField("origin", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("external", T.StringType(), True),
        T.StructField("first_seen", T.StringType(), True),
        T.StructField("last_seen", T.StringType(), True),
        T.StructField("fragment", T.StringType(), True),
    ]
)


def read_statements_csv(
    spark: SparkSession,
    path: str,
    dataset: str,
    origin: str = "default",
    shards: int = 0,
) -> DataFrame:
    """Read a statements.csv into the physical statement schema."""
    raw = spark.read.schema(CSV_READ_SCHEMA).option("header", True).csv(path)
    pt = prop_type(F.col("prop"))
    return raw.select(
        entity_shard(F.col("entity_id"), shards).alias("shard"),
        F.col("id"),
        F.col("entity_id"),
        F.coalesce(F.col("dataset"), F.lit(dataset)).alias("dataset"),
        schema_bucket(F.col("schema")).alias("bucket"),
        F.coalesce(F.col("origin"), F.lit(origin)).alias("origin"),
        F.lit(None).cast("string").alias("source"),
        F.col("schema"),
        F.col("prop"),
        pt.alias("prop_type"),
        F.col("value"),
        F.col("original_value"),
        # lang survives only on linguistic prop types
        F.when(pt.isin(*LINGUISTIC_TYPES), F.col("lang")).alias("lang"),
        F.coalesce(F.col("external") == "true", F.lit(False)).alias("external"),
        F.to_timestamp("first_seen").alias("first_seen"),
        F.to_timestamp("last_seen").alias("last_seen"),
        F.coalesce(F.col("fragment"), F.lit("")).alias("fragment"),
        F.lit(None).cast("timestamp").alias("deleted_at"),
    ).select(*STATEMENT_COLUMNS)
