"""API layer: NDJSON streaming reads + bulk journal write, exercised
through the framework-free NdjsonApi core (fastapi is absent in this
image; create_app is a thin adapter over the same handlers — reference
routes at api/routes/entities.py:34-93, DoS caps at
api/dependencies.py:78-167)."""

import json

import pytest

from ftm_lakehouse_spark.api import MAX_LIMIT, HAVE_FASTAPI, NdjsonApi, create_app
from ftm_lakehouse_spark.lakehouse import Lakehouse


@pytest.fixture()
def api(spark, lake_root):
    lh = Lakehouse(spark, lake_root)
    a = NdjsonApi(lh)
    lines = [
        json.dumps(
            {"id": "jane", "schema": "Person",
             "properties": {"name": ["Jane Doe"], "country": ["de"]}}
        ),
        json.dumps(
            {"id": "acme", "schema": "Company",
             "properties": {"name": ["ACME Inc"]}}
        ),
        "not json at all",
        json.dumps({"schema": "Person"}),  # no id → rejected
        "",
    ]
    res = a.write_entities("demo", lines, origin="bulk")
    assert res == {"accepted": 2, "rejected": 2}
    return a


def test_entities_route_streams_ndjson(api):
    out = [json.loads(line) for line in api.entities("demo", limit=10)]
    assert {o["entity_id"] for o in out} == {"jane", "acme"}
    jane = next(o for o in out if o["entity_id"] == "jane")
    assert jane["schema"] == "Person"
    assert jane["properties"]["name"] == ["Jane Doe"]

    only_people = [json.loads(line) for line in api.entities("demo", schema="Person")]
    assert [o["entity_id"] for o in only_people] == ["jane"]


def test_statements_route_and_origin_filter(api):
    rows = [json.loads(line) for line in api.statements("demo", origin="bulk")]
    assert {r["entity_id"] for r in rows} == {"jane", "acme"}
    assert all(r["origin"] == "bulk" for r in rows)
    assert not list(api.statements("demo", origin="elsewhere"))


def test_point_get_and_stats(api):
    ent = api.get_entity("demo", "jane")
    assert ent["caption"] == "Jane Doe"
    assert api.get_entity("demo", "nobody") is None
    stats = api.stats("demo")
    assert stats["entity_count"] == 2
    assert stats["things"]["schemata"] == {"Person": 1, "Company": 1}


def test_limit_is_clamped(api):
    # a hostile limit must not build an unbounded query (reference DoS
    # caps); clamped to MAX_LIMIT, and the call still streams
    assert NdjsonApi._clamp(10**9) == MAX_LIMIT
    assert NdjsonApi._clamp(-5) == 0
    assert len(list(api.entities("demo", limit=10**9))) == 2


def test_journal_write_is_idempotent(api):
    """Re-posting the same payload collapses to the same rows after
    merge — content-addressed ids make the bulk endpoint safely
    retryable (reference journal dedup semantics)."""
    line = json.dumps(
        {"id": "jane", "schema": "Person",
         "properties": {"name": ["Jane Doe"], "country": ["de"]}}
    )
    api.write_entities("demo", [line], origin="bulk")
    ds = api.lakehouse.dataset("demo")
    ds.merge(force=True)
    rows = [json.loads(x) for x in api.statements("demo", origin="bulk")]
    assert len([r for r in rows if r["entity_id"] == "jane"]) == 3  # 2 props + BASE


def test_create_app_matches_environment():
    if not HAVE_FASTAPI:
        with pytest.raises(NotImplementedError):
            create_app(None)
    else:  # pragma: no cover - fastapi present in some environments
        assert create_app.__name__ == "create_app"
