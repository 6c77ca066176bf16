"""The statement: the engine's fundamental record.

One row = one fact: one property value for one entity from one origin.
Entities are assembled from statements at read time; there is no entity
table. Semantics match the reference's sharded statement schema
(/root/reference/ftm_lakehouse/model/statement.py:36-46, column
materialization at logic/entities/explode.py:96-139) but the schema here
is a native Spark ``StructType`` — storage is hive-partitioned parquet,
written through :mod:`ftm_lakehouse_spark.sources.statement_store`.

Physical layout notes (100 TB design):
  * Partition columns ``(shard, bucket, origin)`` bound every merge /
    overwrite to one partition directory; an entity lives in exactly one
    ``(shard, bucket)``, so entity-grain operations never cross
    partitions (reference: storage/parquet.py:836-861).
  * ``fragment`` uses an empty-string sentinel and is NEVER NULL
    (model/statement.py:48-52) — it participates in grouping keys, and
    NULL would break SQL equality there.
  * All timestamps are tz-aware UTC microseconds; ``last_seen`` is
    second-granularity by producer contract (docs/usage/entities.md:201).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Hive partition keys, in directory order.
PARTITION_COLUMNS = ["shard", "bucket", "origin"]

#: Dedupe group for non-fragment (content-addressed) statements:
#: at most one live row per id per partition
#: (reference: logic/parquet.py:85-97).
MERGE_GROUP_NONFRAGMENT = ["shard", "bucket", "origin", "id"]

#: Supersession group for fragment-bearing statements: a later emission
#: of the same group replaces the earlier one entirely
#: (reference: logic/parquet.py:98-108).
MERGE_GROUP_FRAGMENT = ["shard", "bucket", "origin", "entity_id", "prop", "fragment"]

STATEMENT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("dataset", T.StringType(), False),
        T.StructField("bucket", T.StringType(), False),
        T.StructField("origin", T.StringType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("schema", T.StringType(), False),
        T.StructField("prop", T.StringType(), False),
        T.StructField("prop_type", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
        T.StructField("original_value", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("external", T.BooleanType(), False),
        T.StructField("first_seen", T.TimestampType(), False),
        T.StructField("last_seen", T.TimestampType(), False),
        T.StructField("fragment", T.StringType(), False),
        T.StructField("deleted_at", T.TimestampType(), True),
    ]
)

STATEMENT_COLUMNS = [f.name for f in STATEMENT_SCHEMA.fields]

#: statements.csv export columns, in order
#: (reference: model/statement.py:90-123). ``canonical_id`` always
#: equals ``entity_id`` — no entity resolution in a single-dataset store.
CSV_COLUMNS = [
    "id",
    "entity_id",
    "canonical_id",
    "prop",
    "prop_type",
    "schema",
    "value",
    "original_value",
    "dataset",
    "origin",
    "lang",
    "external",
    "first_seen",
    "last_seen",
    "fragment",
]

#: Clustering sort applied within partitions before every write, so an
#: entity's rows are contiguous inside each file and parquet min/max
#: stats make entity point-lookups skip files
#: (reference 7-key sort: storage/parquet.py:519-529).
WRITE_SORT_COLUMNS = ["entity_id", "fragment", "prop", "id"]

#: FtM schema → coarse storage bucket (reference: docs/architecture.md:99
#: via ftmq get_schema_bucket; usage at logic/entities/explode.py:100).
#: GENERATED from the vendored public FtM model dump
#: (model/ftm_model.json → tools/gen_ontology.py → model/ontology.py);
#: anything unlisted defaults to the ``thing`` bucket, matching the
#: reference's fallback. Applied as a literal map expression, not a
#: join — it is broadcast-size by construction.
from ftm_lakehouse_spark.model.ontology import SCHEMA_BUCKETS  # noqa: E402

BUCKETS = ("thing", "interval", "document", "page", "pages", "mention")

#: Buckets whose ``value`` column carries long text (document bodies,
#: page text) — they take the LARGE parquet writer profile
#: (reference writer_for_bucket, small-vs-large split at
#: storage/parquet.py:487-541).
LARGE_VALUE_BUCKETS = frozenset({"document", "page", "pages"})

#: The synthesized checksum property name carried by every entity
#: emission (reference BASE_ID: helpers/statements.py:102-144).
BASE_ID_PROP = "id"
BASE_ID_PROP_TYPE = "checksum"


def schema_bucket(schema_col: Column) -> Column:
    """Map an FtM schema name to its storage bucket (default ``thing``)."""
    from ftm_lakehouse_spark.functions.literals import lit_str_map

    # one F.expr round trip instead of 120 F.lit calls (functions/literals)
    mapping = lit_str_map(SCHEMA_BUCKETS)
    return F.coalesce(mapping[schema_col], F.lit("thing"))


def entity_shard(entity_id: Column, shards: int) -> Column:
    """Shard key: first 8 hex chars of sha256(entity_id) mod ``shards``,
    zero-padded hex (reference: core/conventions/path.py:245-264 uses an
    internal hash — the exact function is private layout, only the
    *stability* matters). ``shards == 0`` → single shard ``"0"``.
    """
    if shards <= 1:
        return F.lit("0")
    width = max(1, len(f"{shards - 1:x}"))
    bucket = F.pmod(
        F.conv(F.substring(F.sha2(entity_id, 256), 1, 8), 16, 10).cast("long"),
        F.lit(shards),
    )
    return F.lpad(F.lower(F.conv(bucket.cast("string"), 10, 16)), width, "0")


def live_filter() -> Column:
    """The live-view predicate: tombstones excluded
    (reference: logic/parquet.py:189-192). Deliberately a plain
    predicate — no window function — so it pushes down to parquet
    row-group stats."""
    return F.col("deleted_at").isNull()


def with_canonical_id(df):
    """Live view adds ``canonical_id`` = ``entity_id``
    (reference: logic/parquet.py:165-192)."""
    return df.withColumn("canonical_id", F.col("entity_id"))
