"""Pack/unpack wire codec and namespace stripping."""

from pyspark.sql import functions as F

from ftm_lakehouse_spark.functions.codec import (
    PACK_FIELDS,
    namespace_strip,
    pack_statement,
    unpack_statement,
)

from .helpers import make_df, stmt


def test_pack_unpack_roundtrip(spark):
    df = make_df(spark, [stmt(id="a", value="hello world", lang="en")])
    packed = df.select(pack_statement().alias("data"))
    row = packed.select(unpack_statement(F.col("data")).alias("s")).collect()[0]["s"]
    assert row["id"] == "a"
    assert row["value"] == "hello world"
    assert row["lang"] == "en"
    assert row["external"] is False  # wire format: "1"/"0" → boolean
    # fragment is NOT part of the reference wire format (13 fields end
    # with prop_type); supersession keys ride as separate columns
    assert "fragment" not in row.asDict()


def test_unpack_rejects_short_records(spark):
    bad = spark.createDataFrame([("only\x1ftwo",)], ["data"])
    out = bad.select(unpack_statement(F.col("data")).alias("s")).collect()
    assert out[0]["s"] is None


def test_namespace_strip(spark):
    df = spark.createDataFrame(
        [("plain",), ("id.sig123",), ("dotted.id.sig",)], ["x"]
    )
    out = [r["y"] for r in df.select(namespace_strip(F.col("x")).alias("y")).collect()]
    assert out == ["plain", "id", "dotted.id"]


def test_explode_strips_namespaces(spark):
    from ftm_lakehouse_spark.operators.explode import ENTITY_SCHEMA, explode_entities

    ents = spark.createDataFrame(
        [
            {
                "id": "jane.deadbeef",
                "schema": "Person",
                "properties": {"name": ["Jane"], "addressEntity": ["addr1.cafe"]},
                "caption": None, "referents": [], "datasets": [],
                "first_seen": None, "last_seen": None, "last_change": None,
                "origin": [],
            }
        ],
        ENTITY_SCHEMA,
    )
    rows = explode_entities(ents, dataset="t").collect()
    assert {r["entity_id"] for r in rows} == {"jane"}
    addr = [r for r in rows if r["prop"] == "addressEntity"]
    assert addr[0]["value"] == "addr1"
