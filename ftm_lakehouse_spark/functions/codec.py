"""Wire codecs and id normalization.

* pack/unpack: the unit-separator statement codec (reference C5,
  /root/reference/ftm_lakehouse/helpers/statements.py:17-99) — the
  journal's ``data`` column format. WIRE-COMPATIBLE with reference
  exports: same 13-field order (id, entity_id, prop, schema, value,
  dataset, lang, original_value, external as 1/0, first_seen,
  last_seen, origin, prop_type), same >=12-field tolerance on unpack
  (trailing ``prop_type`` ignored, extra fields tolerated for forward
  compatibility).
* namespace_strip: FtM namespace signatures are appended to entity ids
  as ``<id>.<signature>``; storage keeps plain ids (reference C6,
  logic/entities/explode.py:37-39 via followthemoney Namespace.strip,
  which drops the segment after the LAST dot).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "PACK_FIELDS",
    "pack_statement",
    "unpack_statement",
    "namespace_strip",
    "clean_entity_id",
]

US = "\x1f"

#: packed field order (13 fields, reference helpers/statements.py:43-68)
PACK_FIELDS = [
    "id",
    "entity_id",
    "prop",
    "schema",
    "value",
    "dataset",
    "lang",
    "original_value",
    "external",
    "first_seen",
    "last_seen",
    "origin",
    "prop_type",
]

#: minimum fields unpack accepts (reference UNPACK_MIN_FIELDS)
UNPACK_MIN_FIELDS = 12


def _pack_field(name: str) -> Column:
    col = F.col(name)
    if name == "external":
        # reference encodes the bool as "1"/"0"
        return F.when(col.cast("boolean"), F.lit("1")).otherwise(F.lit("0"))
    if name in ("first_seen", "last_seen"):
        # reference emits datetime.isoformat() of a UTC-aware value:
        # "+00:00" offset, fractional seconds only when non-zero
        # (requires a UTC session timezone — session.tune_for_local)
        frac = F.date_format(col, "SSSSSS")
        iso = F.concat(
            F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss"),
            F.when(frac != "000000", F.concat(F.lit("."), frac)).otherwise(F.lit("")),
            F.lit("+00:00"),
        )
        return F.coalesce(iso, F.lit(""))
    return F.coalesce(col.cast("string"), F.lit(""))


def pack_statement() -> Column:
    """Statement row → one US-delimited string column (reference
    ``pack_statement`` format, byte-order compatible)."""
    return F.concat_ws(US, *[_pack_field(c) for c in PACK_FIELDS])


def unpack_statement(packed: Column):
    """US-delimited string → struct of the packed fields (strings;
    callers cast timestamps/bool). Reads the first 12 fields like the
    reference — ``prop_type`` is recomputed downstream, shorter rows
    are NULL (the reference raises and skips them in its flush loop)."""
    parts = F.split(packed, US, -1)
    fields = []
    for i, name in enumerate(PACK_FIELDS[:UNPACK_MIN_FIELDS]):
        if name == "external":
            fields.append((parts[i] == "1").alias(name))
        else:
            fields.append(F.when(F.length(parts[i]) > 0, parts[i]).alias(name))
    return F.when(F.size(parts) >= UNPACK_MIN_FIELDS, F.struct(*fields))


def namespace_strip(entity_id: Column) -> Column:
    """Drop a namespace signature (the segment after the last ``.``).
    Ids without a dot pass through unchanged — matching FtM
    ``Namespace.strip`` semantics."""
    return F.when(
        entity_id.contains("."),
        F.regexp_replace(entity_id, r"\.[^.]*$", ""),
    ).otherwise(entity_id)


#: entity-id shape accepted by FtM's registry clean (types/entity.py):
#: alphanumeric first/last char, [alnum . _ -] inside. Ids failing the
#: clean are dropped by the safe path (reference test:
#: tests/test_logic_explode.py:114-133 — ``strip_namespace("jane doe")
#: is None``).
_ENTITY_ID_RE = r"^[0-9a-zA-Z]([0-9a-zA-Z._-]*[0-9a-zA-Z])?$"


def clean_entity_id(entity_id: Column) -> Column:
    """Registry-clean + namespace-strip an entity id: NULL for ids that
    fail the FtM entity-id shape (whitespace, leading/trailing
    punctuation), else the id with its namespace signature removed —
    the composition the reference's ``strip_namespace`` performs
    (logic/entities/explode.py:37-39)."""
    trimmed = F.trim(entity_id)
    return F.when(
        trimmed.rlike(_ENTITY_ID_RE), namespace_strip(trimmed)
    )
