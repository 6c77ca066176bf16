"""Statement-row factory for merge-semantics tests (mirrors the shape
the reference's golden tests build in PyArrow,
/root/reference/tests/test_logic_parquet.py:13-33)."""

from datetime import datetime, timezone

from ftm_lakehouse_spark.model.statement import STATEMENT_SCHEMA


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


def stmt(
    id="s1",
    entity_id="e1",
    prop="name",
    value="v",
    fragment="",
    origin="default",
    first_seen="2024-01-01T00:00:00",
    last_seen="2024-01-01T00:00:00",
    deleted_at=None,
    shard="0",
    bucket="thing",
    schema="Person",
    prop_type="name",
    dataset="test",
    lang=None,
):
    return {
        "shard": shard,
        "id": id,
        "entity_id": entity_id,
        "dataset": dataset,
        "bucket": bucket,
        "origin": origin,
        "source": None,
        "schema": schema,
        "prop": prop,
        "prop_type": prop_type,
        "value": value,
        "original_value": None,
        "lang": lang,
        "external": False,
        "first_seen": ts(first_seen),
        "last_seen": ts(last_seen),
        "fragment": fragment,
        "deleted_at": ts(deleted_at) if deleted_at else None,
    }


def make_df(spark, rows):
    return spark.createDataFrame(rows, STATEMENT_SCHEMA)
