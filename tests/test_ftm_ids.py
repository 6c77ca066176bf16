"""Byte parity of statement ids / BASE_ID checksums with followthemoney.

The reference's contract is cross-tool interop: a payload imported here
and a payload imported through ftm-lakehouse must collapse to the SAME
physical rows (reference logic/entities/explode.py:129,196 calls the
public ``Statement.make_key``; helpers/statements.py:102-144 seeds
``sha1(schema)`` and updates with ``sorted(set(ids))``). The expected
hex digests below are LITERALS computed once from the public formula —
not round-tripped through the code under test — so a drift in either
the Spark expression or this replica fails loudly.
"""

from hashlib import sha1

from pyspark.sql import functions as F

from ftm_lakehouse_spark.functions.codec import (
    PACK_FIELDS,
    clean_entity_id,
    pack_statement,
    unpack_statement,
)
from ftm_lakehouse_spark.operators.explode import (
    base_id_checksum,
    explode_entities,
    statement_id,
)


def ftm_stmt_key(dataset, entity_id, prop, value, external=False,
                 lang=None, original_value=None):
    """Independent replica of followthemoney's public ``stmt_key``."""
    k = f"{dataset}.{entity_id}.{prop}.{value}"
    if lang is not None or original_value is not None:
        k = f"{k}.{lang or ''}.{original_value or ''}"
    if external is True:
        k = f"{k}.ext"
    return sha1(k.encode("utf-8")).hexdigest()


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_statement_id_golden_literals(spark):
    """Pinned digests — the formula, not the implementation, is the
    source of truth (reference test shape:
    tests/test_logic_explode.py:110,198)."""
    cases = [
        # (args, literal sha1 expected)
        (("test", "x", "name", "X", False, None), "6139d4eb411496cca64b4c6b2cb7e435a6f7bc93"),
        (("dst", "e1", "birthDate", "1980-01-01", True, None), "76fc92450e7c5af4d195523b9cd38f5cc7e3b64a"),
        (("ds", "e2", "notes", "hello", False, "de"), "9afe464e0628708caa09d9a09e77f1ebe493bbf1"),
    ]
    exprs = [
        statement_id(
            F.lit(ds), F.lit(e), F.lit(p), F.lit(v),
            F.lit(ext), F.lit(lang).cast("string"),
        )
        for (ds, e, p, v, ext, lang), _ in cases
    ]
    row = spark.range(1).select(
        *[x.alias(f"c{i}") for i, x in enumerate(exprs)]
    ).first()
    for i, ((args), expected) in enumerate(cases):
        assert row[f"c{i}"] == expected
        assert ftm_stmt_key(*args[:5], lang=args[5]) == expected


def test_statement_id_null_component_is_null(spark):
    """NULL components null the id — the reference skips such rows
    (make_key returned None)."""
    out = _one(
        spark,
        statement_id(
            F.lit("d"), F.lit(None).cast("string"), F.lit("p"), F.lit("v"),
            F.lit(False), F.lit(None).cast("string"),
        ),
    )
    assert out is None


def test_base_id_checksum_golden(spark):
    """sha1(schema) updated with sorted(set(ids)) — duplicates and
    input order must not perturb the digest."""
    ids = [
        ftm_stmt_key("test", "x", "name", "X"),
        ftm_stmt_key("test", "x", "country", "de"),
    ]
    expected = "78e7bfc57a7944f70971e49309755c2559e71e60"
    # order-reversed and with a duplicate: same digest
    arr = F.array(*[F.lit(x) for x in (ids[::-1] + [ids[0]])])
    assert _one(spark, base_id_checksum(F.lit("Person"), arr)) == expected
    # the stub row's own id is content-addressed on the checksum value
    assert (
        ftm_stmt_key("test", "x", "id", expected)
        == "3a258f9e6cc7b3339283d4b6ea114cd0cfd14cdb"
    )


def test_explode_emits_ftm_ids(spark):
    """End-to-end: explode_entities produces make_key ids and the
    reference checksum stub (reference tests/test_logic_explode.py:110)."""
    ents = spark.createDataFrame(
        [("x", "X", "Person", {"name": ["X"], "country": ["de"]})],
        "id string, caption string, schema string, properties map<string,array<string>>",
    )
    rows = {
        (r["prop"], r["value"]): r
        for r in explode_entities(ents, "test", origin="bulk").collect()
    }
    name = rows[("name", "X")]
    assert name["id"] == ftm_stmt_key("test", "x", "name", "X")
    country = rows[("country", "de")]
    assert country["id"] == ftm_stmt_key("test", "x", "country", "de")
    stub = rows[("id", "78e7bfc57a7944f70971e49309755c2559e71e60")]
    assert stub["id"] == ftm_stmt_key(
        "test", "x", "id", "78e7bfc57a7944f70971e49309755c2559e71e60"
    )


def test_explode_drops_unclean_ids(spark):
    """Ids failing the registry clean vanish like in the reference safe
    path (tests/test_logic_explode.py:123-133): the whole entity for a
    bad id, just the row for a bad entity-ref value."""
    ents = spark.createDataFrame(
        [
            ("jane doe", None, "Person", {"name": ["x"]}),
            ("jane", None, "Person", {"name": ["x"], "proof": ["bad ref"]}),
        ],
        "id string, caption string, schema string, properties map<string,array<string>>",
    )
    rows = explode_entities(ents, "test").collect()
    assert {r["entity_id"] for r in rows} == {"jane"}
    assert sorted(r["prop"] for r in rows) == ["id", "name"]


def test_clean_entity_id_semantics(spark):
    cases = {
        "jane": "jane",
        "jane.f00d": "jane",
        "a.b.c": "a.b",
        "jane doe": None,
        " pad ": "pad",
    }
    df = spark.createDataFrame([(k,) for k in cases], "raw string")
    out = {r["raw"]: r["c"] for r in df.select("raw", clean_entity_id(F.col("raw")).alias("c")).collect()}
    assert out == cases


def test_pack_wire_format(spark):
    """Packed bytes match the reference pack_statement field order
    (helpers/statements.py:43-68): id, entity_id, prop, schema, value,
    dataset, lang, original_value, external as 1/0, first_seen,
    last_seen, origin, prop_type."""
    from datetime import datetime

    df = spark.createDataFrame(
        [
            (
                "sid1", "e1", "name", "Person", "Jane", "ds", None, None,
                True, datetime(2024, 1, 1), datetime(2024, 1, 2),
                "bulk", "name",
            )
        ],
        "id string, entity_id string, prop string, schema string, value string,"
        " dataset string, lang string, original_value string, external boolean,"
        " first_seen timestamp, last_seen timestamp, origin string, prop_type string",
    )
    packed = df.select(pack_statement().alias("p")).first()["p"]
    parts = packed.split("\x1f")
    assert len(parts) == len(PACK_FIELDS) == 13
    assert parts[0] == "sid1"
    assert parts[1] == "e1"
    assert parts[2] == "name"
    assert parts[3] == "Person"
    assert parts[4] == "Jane"
    assert parts[5] == "ds"
    assert parts[6] == "" and parts[7] == ""          # lang, original_value
    assert parts[8] == "1"                            # external → "1"/"0"
    assert parts[9] == "2024-01-01T00:00:00+00:00"    # isoformat, no frac
    assert parts[10] == "2024-01-02T00:00:00+00:00"
    assert parts[11] == "bulk"
    assert parts[12] == "name"

    back = df.select(pack_statement().alias("p")).select(
        unpack_statement(F.col("p")).alias("s")
    ).select("s.*").first()
    assert back["id"] == "sid1"
    assert back["origin"] == "bulk"
    assert back["external"] is True
    assert back["lang"] is None

    # <12 fields → NULL (reference raises MalformedStatementError and
    # skips the row)
    short = spark.createDataFrame([("a\x1fb",)], "p string")
    assert short.select(unpack_statement(F.col("p")).alias("s")).first()["s"] is None
