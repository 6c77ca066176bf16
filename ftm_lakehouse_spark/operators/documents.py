"""Documents surface: the reference's DocumentRepository re-expressed
as DataFrame ops (reference repository/documents.py:24-173 — driver-side
Python iteration over every entity there; one explode + broadcast join
here, so the document list streams at corpus scale).

Behavioral contract mirrored from the reference:

  * a *document* is any Document-family entity except ``Folder`` that
    carries a ``contentHash`` (``collect``, documents.py:94-117);
  * ``name`` is the entity caption; ``mimetype`` prefers the first
    non-generic ``mimeType`` property, falling back to an
    extension-based guess from the name (``pick_mime`` +
    ``guess_mimetype``, helpers/file.py:101-112);
  * ``path`` is the folder chain resolved by walking ``parent``
    references through ``Folder`` entities, whose display name is
    ``fileName[0]`` falling back to caption (``make_paths``,
    documents.py:53-86); a document is emitted once per parent whose
    path resolved, or exactly once with a null path otherwise
    (documents.py:102-117);
  * ``public_url`` joins a prefix with the archive blob fan-out path
    ``archive/ab/cd/ef/<checksum>/blob`` (util.py:150-164,
    path.archive_blob).

Scale: the folder table is dimension-sized (it IS the directory tree),
so the path join broadcasts; documents flow through one projection +
explode + join — no driver-side iteration, no collect.
"""

from __future__ import annotations

import mimetypes

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ftm_lakehouse_spark.model.ontology import SCHEMA_ANCESTORS
from ftm_lakehouse_spark.operators.graph import resolve_parent_chains

__all__ = ["DOCUMENT_SCHEMATA", "folder_paths", "documents", "DOCUMENT_COLUMNS"]

#: Document-family schemata (ontology descendants of Document), the
#: reference's ``M(schemata="Document")`` match set.
DOCUMENT_SCHEMATA = sorted(
    s
    for s, anc in SCHEMA_ANCESTORS.items()
    if s == "Document" or "Document" in anc
)

#: csv column order (reference model/file.py:26-37 field order)
DOCUMENT_COLUMNS = [
    "id",
    "checksum",
    "name",
    "mimetype",
    "path",
    "size",
    "updated_at",
    "public_url",
]

GENERIC_MIME = "application/octet-stream"


def _ext_mime_map():
    """Extension → mimetype as a Catalyst literal map (the JVM-side
    stand-in for the reference's ``guess_mimetype(caption)``) — a
    constant expression, no UDF in the row path."""
    from ftm_lakehouse_spark.functions.literals import lit_str_map

    # one F.expr round trip instead of ~300 F.lit calls (functions/literals)
    return lit_str_map(
        {
            ext.lstrip(".").lower(): mime
            for ext, mime in sorted(mimetypes.types_map.items())
        }
    )


def folder_paths(entities: DataFrame, max_depth: int = 32) -> DataFrame:
    """(folder_id, path) for every Folder entity — parent chains walked
    by the graph operator (J5); cycles keep their partial path, exactly
    the reference's visited-set break (documents.py:74-85)."""
    folders = entities.filter(F.col("schema") == "Folder")
    nodes = folders.select(
        F.col("entity_id").alias("id"),
        F.try_element_at(F.col("properties").getItem("parent"), F.lit(1)).alias("parent"),
        F.coalesce(
            F.try_element_at(F.col("properties").getItem("fileName"), F.lit(1)),
            F.col("caption"),
            F.lit(""),
        ).alias("name"),
    )
    return resolve_parent_chains(nodes, max_depth=max_depth).select(
        F.col("id").alias("folder_id"), "path"
    )


def documents(entities: DataFrame, public_url_prefix: str | None = None) -> DataFrame:
    """The streamable document list over assembled entities.

    Output columns: ``id checksum name mimetype path size updated_at
    public_url`` (reference Document model field order). ``entities``
    is ``assemble_entities`` output (entity_id, caption, schema,
    properties, ..., last_change).
    """
    props = F.col("properties")
    doc_schemas = [s for s in DOCUMENT_SCHEMATA if s != "Folder"]
    checksum = F.try_element_at(props.getItem("contentHash"), F.lit(1))
    d = entities.filter(
        F.col("schema").isin(doc_schemas) & checksum.isNotNull()
    )

    name = F.coalesce(F.col("caption"), F.lit(""))
    ext = F.lower(F.try_element_at(F.split(name, r"\."), F.lit(-1)))
    prop_mime = F.filter(
        F.coalesce(props.getItem("mimeType"), F.array()),
        lambda m: m != GENERIC_MIME,
    )
    mime = F.coalesce(
        F.try_element_at(prop_mime, F.lit(1)),
        _ext_mime_map()[ext],
        F.lit(GENERIC_MIME),
    )
    base = d.select(
        F.col("entity_id").alias("id"),
        checksum.alias("checksum"),
        name.alias("name"),
        mime.alias("mimetype"),
        F.coalesce(
            F.try_element_at(props.getItem("fileSize"), F.lit(1)).cast("bigint"), F.lit(0)
        ).alias("size"),
        F.col("last_change").alias("updated_at"),
        F.coalesce(props.getItem("parent"), F.array()).alias("_parents"),
    )

    paths = folder_paths(entities)
    exploded = base.withColumn("_parent", F.explode_outer("_parents")).drop("_parents")
    joined = exploded.join(
        F.broadcast(paths), exploded["_parent"] == paths["folder_id"], "left"
    ).drop("folder_id")

    # one row per RESOLVED parent path; exactly one null-path row for
    # documents with no resolvable parent (reference documents.py:102-117)
    w = Window.partitionBy("id")
    any_resolved = F.max(F.col("path").isNotNull().cast("int")).over(w)
    rn = F.row_number().over(w.orderBy(F.col("_parent").asc_nulls_last()))
    out = (
        joined.withColumn("_any", any_resolved)
        .withColumn("_rn", rn)
        .filter(F.col("path").isNotNull() | ((F.col("_any") == 0) & (F.col("_rn") == 1)))
    )

    if public_url_prefix:
        blob = F.concat_ws(
            "/",
            F.lit(public_url_prefix.rstrip("/")),
            F.lit("archive"),
            F.substring("checksum", 1, 2),
            F.substring("checksum", 3, 2),
            F.substring("checksum", 5, 2),
            F.col("checksum"),
            F.lit("blob"),
        )
        out = out.withColumn("public_url", blob)
    else:
        out = out.withColumn("public_url", F.lit(None).cast("string"))
    return out.select(*DOCUMENT_COLUMNS)
