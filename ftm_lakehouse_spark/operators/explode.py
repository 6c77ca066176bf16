"""Entity → statement explosion (the ingest transform).

Reference behavior: /root/reference/ftm_lakehouse/logic/entities/
explode.py:42-219 — each entity dict becomes one row per
(prop, value) pair plus one synthesized BASE_ID checksum row; every
statement id is content-addressed; one ``last_seen`` is pinned per
emission so supersession groups stay consistent
(docs/usage/entities.md:187-201).

Spark realization: the whole transform is native column expressions —
``explode`` over the properties map, ``sha1`` for ids — no Python in
the row path. The FtM registry concerns (prop types, schema buckets)
are broadcast-size literal maps.

Statement id formula (C2): byte-compatible with the public
followthemoney ``stmt_key`` — ``sha1(f"{dataset}.{entity_id}.{prop}.
{value}")`` with the conditional lang/original_value segment and the
``.ext`` suffix for external statements; the BASE_ID checksum is
``sha1(schema + "".join(sorted(set(ids))))`` exactly as
``make_base_id_statement`` computes it. Pinned by literal-digest
golden tests in tests/test_ftm_ids.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ftm_lakehouse_spark.functions.literals import lit_str_map
from ftm_lakehouse_spark.model.statement import (
    BASE_ID_PROP,
    BASE_ID_PROP_TYPE,
    STATEMENT_COLUMNS,
    entity_shard,
    schema_bucket,
)

__all__ = ["ENTITY_SCHEMA", "explode_entities", "statement_id", "base_id_checksum"]

#: Wire schema of one FtM entity JSON line (FIXTURES.md F2;
#: reference reader at repository/entities/main.py:346-359).
ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
        T.StructField("schema", T.StringType(), False),
        T.StructField(
            "properties",
            T.MapType(T.StringType(), T.ArrayType(T.StringType())),
            True,
        ),
        T.StructField("referents", T.ArrayType(T.StringType()), True),
        T.StructField("datasets", T.ArrayType(T.StringType()), True),
        T.StructField("first_seen", T.StringType(), True),
        T.StructField("last_seen", T.StringType(), True),
        T.StructField("last_change", T.StringType(), True),
        T.StructField("origin", T.ArrayType(T.StringType()), True),
    ]
)

#: FtM property → type name (reference recomputes prop_type from the
#: model and nulls ``lang`` for non-linguistic types:
#: logic/entities/explode.py:190-194). GENERATED from the vendored
#: model dump — imported here so existing call sites keep working.
from ftm_lakehouse_spark.model.ontology import PROP_TYPES  # noqa: E402,F401


#: prop types that carry language information — everything else gets
#: ``lang`` nulled.
LINGUISTIC_TYPES = ("name", "string", "text", "html")


def prop_type(prop: Column) -> Column:
    # one F.expr round trip instead of 190 F.lit calls (functions/literals)
    mapping = lit_str_map(PROP_TYPES)
    return F.coalesce(mapping[prop], F.lit("string"))


def statement_id(
    dataset: Column, entity_id: Column, prop: Column, value: Column,
    external: Column, lang: Column, original_value: Column | None = None,
) -> Column:
    """Content-addressed statement id — BYTE-COMPATIBLE with the public
    followthemoney ``stmt_key`` formula (``Statement.make_key``; the
    reference calls it at logic/entities/explode.py:129,196)::

        key = f"{dataset}.{entity_id}.{prop}.{value}"
        if lang is not None or original_value is not None:
            key += f".{lang or ''}.{original_value or ''}"
        if external is True:
            key += ".ext"
        sha1(key.encode("utf-8")).hexdigest()

    The lang/original_value segment is appended per-row when either is
    non-null, mirroring the Python-level None checks. Pinned against
    literal digests in tests/test_ftm_ids.py."""
    if original_value is None:
        original_value = F.lit(None).cast("string")
    # F.concat (not concat_ws): a NULL component nulls the whole id,
    # matching the reference's "make_key returned None → skip row"
    key = F.concat(
        dataset, F.lit("."), entity_id, F.lit("."), prop, F.lit("."), value
    )
    extra = F.when(
        lang.isNotNull() | original_value.isNotNull(),
        F.concat(
            F.lit("."),
            F.coalesce(lang, F.lit("")),
            F.lit("."),
            F.coalesce(original_value, F.lit("")),
        ),
    ).otherwise(F.lit(""))
    ext = F.when(external.cast("boolean"), F.lit(".ext")).otherwise(F.lit(""))
    return F.sha1(F.concat(key, extra, ext))


def base_id_checksum(schema: Column, ids: Column) -> Column:
    """BASE_ID checksum — byte-compatible with the reference's
    ``make_base_id_statement`` (helpers/statements.py:102-144): one sha1
    digest seeded with the schema name and updated with the entity's
    statement ids, **sorted and de-duplicated**. ``digest.update`` is
    stream concatenation, so this is exactly
    ``sha1(schema + "".join(sorted(set(ids))))`` — deterministic under
    any shuffle order, and duplicate property values cannot perturb
    ``last_change`` across a round-trip."""
    return F.sha1(
        F.concat(schema, F.concat_ws("", F.array_sort(F.array_distinct(ids))))
    )


def explode_entities(
    entities: DataFrame,
    dataset: str,
    origin: str = "default",
    shards: int = 0,
    seen: Column | None = None,
    fragment: str = "",
) -> DataFrame:
    """Explode entity rows (ENTITY_SCHEMA shape) into statement rows.

    * one row per (prop, value) pair (multi-valued props are rows —
      reference keeps no arrays in physical storage, SURVEY §1.2);
    * plus one BASE_ID checksum row per entity, whose value folds the
      sorted ids of the entity's statements — this is what makes
      ``last_change`` detection and idempotent re-import work;
    * one pinned ``last_seen``/``first_seen`` per call (producer
      contract: all rows of one emission share one last_seen).
    """
    from ftm_lakehouse_spark.functions.codec import clean_entity_id

    now = F.date_trunc("second", seen if seen is not None else F.current_timestamp())

    base = entities.select(
        # ids are registry-cleaned + namespace-stripped on ingest (C6,
        # reference explode.py:37-39,89,125-128); entities whose id
        # fails the clean vanish entirely, like the safe path
        clean_entity_id(F.col("id")).alias("entity_id"),
        F.col("schema"),
        F.explode("properties").alias("prop", "values"),
    ).filter(F.col("entity_id").isNotNull())
    pairs = base.select(
        "entity_id",
        "schema",
        "prop",
        F.explode("values").alias("value"),
    )
    pt = prop_type(F.col("prop"))
    stmts = pairs.select(
        F.col("entity_id"),
        F.col("schema"),
        F.col("prop"),
        pt.alias("prop_type"),
        # entity-reference values are ids too — cleaned the same way;
        # unclean refs are dropped, not passed through (reference
        # explode.py:124-128)
        F.when(pt == "entity", clean_entity_id(F.col("value")))
        .otherwise(F.col("value"))
        .alias("value"),
    ).filter(F.col("value").isNotNull())

    # BASE_ID row: value = fold of the entity's sorted statement ids
    ext = F.lit(False)
    lang = F.lit(None).cast("string")
    sid = statement_id(F.lit(dataset), F.col("entity_id"), F.col("prop"), F.col("value"), ext, lang)
    checksum = (
        stmts.select("entity_id", "schema", sid.alias("sid"))
        .groupBy("entity_id", "schema")
        .agg(F.collect_list("sid").alias("sids"))
        .select(
            "entity_id",
            "schema",
            F.lit(BASE_ID_PROP).alias("prop"),
            F.lit(BASE_ID_PROP_TYPE).alias("prop_type"),
            base_id_checksum(F.col("schema"), F.col("sids")).alias("value"),
        )
    )

    all_rows = stmts.unionByName(checksum)
    return all_rows.select(
        entity_shard(F.col("entity_id"), shards).alias("shard"),
        statement_id(
            F.lit(dataset), F.col("entity_id"), F.col("prop"), F.col("value"), ext, lang
        ).alias("id"),
        F.col("entity_id"),
        F.lit(dataset).alias("dataset"),
        schema_bucket(F.col("schema")).alias("bucket"),
        F.lit(origin).alias("origin"),
        F.lit(None).cast("string").alias("source"),
        F.col("schema"),
        F.col("prop"),
        F.col("prop_type"),
        F.col("value"),
        F.lit(None).cast("string").alias("original_value"),
        # entity-JSON properties carry no lang; the statements-CSV path
        # applies the LINGUISTIC_TYPES nulling rule instead
        lang.alias("lang"),
        ext.alias("external"),
        now.alias("first_seen"),
        now.alias("last_seen"),
        F.lit(fragment).alias("fragment"),
        F.lit(None).cast("timestamp").alias("deleted_at"),
    ).select(*STATEMENT_COLUMNS)
