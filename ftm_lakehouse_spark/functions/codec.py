"""Wire codecs and id normalization.

* pack/unpack: the unit-separator statement codec (reference C5,
  /root/reference/ftm_lakehouse/helpers/statements.py:17-99) — the
  journal's ``data`` column format, kept for wire compatibility with
  reference exports even though this engine has no SQL journal.
* namespace_strip: FtM namespace signatures are appended to entity ids
  as ``<id>.<signature>``; storage keeps plain ids (reference C6,
  logic/entities/explode.py:37-39 via followthemoney Namespace.strip,
  which drops the segment after the LAST dot).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PACK_FIELDS", "pack_statement", "unpack_statement", "namespace_strip"]

US = "\x1f"

#: packed field order (13 fields, reference helpers/statements.py:43-68)
PACK_FIELDS = [
    "id",
    "entity_id",
    "dataset",
    "schema",
    "prop",
    "prop_type",
    "value",
    "original_value",
    "lang",
    "external",
    "first_seen",
    "last_seen",
    "fragment",
]


def pack_statement() -> Column:
    """Statement row → one US-delimited string column."""
    return F.concat_ws(
        US,
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(""))
            for c in PACK_FIELDS
        ],
    )


def unpack_statement(packed: Column):
    """US-delimited string → struct of the 13 packed fields (strings;
    callers cast timestamps/bool). Validates field count like the
    reference's >=12-field check."""
    parts = F.split(packed, US, -1)
    fields = [
        F.when(F.length(parts[i]) > 0, parts[i]).alias(name)
        for i, name in enumerate(PACK_FIELDS)
    ]
    return F.when(F.size(parts) >= 12, F.struct(*fields))


def namespace_strip(entity_id: Column) -> Column:
    """Drop a namespace signature (the segment after the last ``.``).
    Ids without a dot pass through unchanged — matching FtM
    ``Namespace.strip`` semantics."""
    return F.when(
        entity_id.contains("."),
        F.regexp_replace(entity_id, r"\.[^.]*$", ""),
    ).otherwise(entity_id)
