"""RESTORE: roll the statement table back (or forward) to a past
commit's snapshot with one metadata-only commit — the portable analog
of the reference's ZFS snapshot rollback (core/zfs.py + zfs-agent),
expressed against the MVCC commit log (Delta RESTORE semantics):
time-travelable, vacuum-bounded, dirty-marking, matview-exact."""

import pytest

from ftm_lakehouse_spark.model.dataset import DatasetConfig
from ftm_lakehouse_spark.sources.statement_store import StatementStore

from .helpers import make_df, stmt


def _store(spark, tmp_path):
    return StatementStore(
        spark, str(tmp_path / "store"), DatasetConfig(name="restore-test")
    )


def _values(store, as_of=None):
    return sorted(r["value"] for r in store.raw(as_of=as_of).collect())


def test_restore_roundtrip_and_time_travel(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.append(make_df(spark, [stmt(id="a", value="v1")]))
    v_a = store.commits.current_version()
    store.append(make_df(spark, [stmt(id="b", value="v2")]))
    head = store.commits.current_version()
    assert _values(store) == ["v1", "v2"]

    res = store.restore(v_a)
    assert res["restored"] is True and res["from_version"] == v_a
    assert _values(store) == ["v1"]
    # the restore is itself time-travelable: the undone state is still
    # readable at the pre-restore head until vacuum ages it out
    assert _values(store, as_of=head) == ["v1", "v2"]

    # restore FORWARD to the pre-restore head state
    store.restore(head)
    assert _values(store) == ["v1", "v2"]

    # restoring to the current state is a no-op (no commit published)
    before = store.commits.current_version()
    assert store.restore(before)["restored"] is False
    assert store.commits.current_version() == before


def test_restore_marks_partitions_dirty_for_merge(spark, tmp_path):
    store = _store(spark, tmp_path)
    # two emissions of one id → merge collapses them
    store.append(make_df(spark, [stmt(id="a", value="v1")]))
    store.append(
        make_df(spark, [stmt(id="a", value="v1", last_seen="2024-01-02T00:00:00")])
    )
    v_dup = store.commits.current_version()
    assert store.merge(force=True)
    assert store.raw().count() == 1
    assert store.dirty_partitions() == []

    # restore to the pre-merge (duplicated, un-canonicalized) snapshot:
    # the partition must be dirty again so a later merge re-folds it
    store.restore(v_dup)
    assert store.raw().count() == 2
    assert store.dirty_partitions() == [("0", "thing", "default")]
    assert store.merge()  # non-forced merge picks it up
    assert store.raw().count() == 1


def test_restore_validates_version_and_vacuumed_targets(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.append(make_df(spark, [stmt(id="a", value="v1")]))
    v_a = store.commits.current_version()
    with pytest.raises(ValueError):
        store.restore(0)
    with pytest.raises(ValueError):
        store.restore(v_a + 99)

    # merge retires v_a's files; vacuum(0) reaps them physically —
    # restore must refuse loudly, not resurrect ghosts
    store.append(
        make_df(spark, [stmt(id="a", value="v1", last_seen="2024-01-02T00:00:00")])
    )
    store.merge(force=True)
    store.vacuum(retention_hours=0.0)
    with pytest.raises(RuntimeError, match="vacuumed"):
        store.restore(v_a)


def test_restore_drops_partitions_created_after_target(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.append(make_df(spark, [stmt(id="a", value="v1", origin="base")]))
    v_a = store.commits.current_version()
    store.append(make_df(spark, [stmt(id="b", value="v2", origin="late")]))
    assert store.raw().count() == 2

    store.restore(v_a)
    assert _values(store) == ["v1"]
    # the late partition is live-empty but still time-travelable
    assert store.raw(as_of=v_a + 1).count() == 2


def test_restore_keeps_incremental_matview_exact(spark, tmp_path):
    from ftm_lakehouse_spark.operators.matview import IncrementalAggregate

    store = _store(spark, tmp_path)
    store.append(make_df(spark, [stmt(id="a", value="v1")]))
    v_a = store.commits.current_version()
    store.append(
        make_df(spark, [stmt(id="b", value="v2"), stmt(id="c", value="v3")])
    )

    mv = IncrementalAggregate(store, str(tmp_path / "mv"), keys=["schema"])
    mv.refresh()
    assert mv.read().collect()[0]["n"] == 3

    # a restore in the refresh span must fold like a rewrite: the
    # touched partition's state is recomputed from the head snapshot
    store.restore(v_a)
    mv.refresh()
    rows = mv.read().collect()
    assert rows and rows[0]["n"] == 1


def test_restore_via_dataset_api_with_job_record(spark, lake_root):
    from ftm_lakehouse_spark.api import NdjsonApi
    from ftm_lakehouse_spark.lakehouse import Lakehouse

    from .test_lakehouse import ACME, JANE, entities_df

    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("restoreds")
    ds.write_entities(entities_df(spark, JANE), origin="bulk")
    v1 = ds.store.commits.current_version()
    ds.write_entities(entities_df(spark, ACME), origin="bulk")
    assert ds.store.count_entities() == 2

    api = NdjsonApi(lake)
    res = api.run_operation("restoreds", "restore", version=v1)
    assert res["op"] == "restore" and res["restored"] is True
    assert ds.store.count_entities() == 1
    rec = ds.jobs.latest("restore")
    assert rec is not None and rec.exc is None
    assert rec.result["from_version"] == v1


def test_raw_since_across_restore_forward_keeps_live_files(spark, tmp_path):
    """Round-4 ADVICE (high): files_since pooled all removals, so a
    cursor spanning restore→restore-forward silently dropped files the
    second restore re-added. Ordered replay + the restore rescan
    channel must deliver every row live at head."""
    store = _store(spark, tmp_path)
    store.append(make_df(spark, [stmt(id="a", value="v1")]))
    v1 = store.commits.current_version()
    store.append(make_df(spark, [stmt(id="b", entity_id="e2", value="v2")]))
    head = store.commits.current_version()
    store.restore(v1)  # removes b's file
    store.restore(head)  # re-adds it (the re-add a pooled set swallows)
    inc = store.raw_since(v1)
    vals = sorted(r["value"] for r in inc.collect())
    assert "v2" in vals  # the restored-live row is delivered
    # superset contract: everything delivered is live at head
    assert set(vals) <= set(_values(store))


def test_raw_since_across_rewrite_then_restore(spark, tmp_path):
    """Cursor spanning rewrite→restore: the restore re-adds files the
    rewrite removed; consumers must see the restored partition's
    current content, not an empty diff."""
    store = _store(spark, tmp_path)
    store.append(make_df(spark, [stmt(id="a", value="v1")]))
    v1 = store.commits.current_version()
    store.append(
        make_df(spark, [stmt(id="a", value="v1", last_seen="2024-01-02T00:00:00")])
    )
    v_dup = store.commits.current_version()
    store.merge(force=True)  # rewrite: retires the two appends' files
    store.restore(v_dup)  # re-adds them, removes the merged file
    inc = store.raw_since(v1)
    assert inc.count() == store.raw().count() == 2


def test_restore_to_empty_surfaces_deletions(spark, tmp_path):
    """Round-4 ADVICE (medium): restore can DELETE entities outright
    (roll an append back to an empty partition) — inexpressible in the
    additive raw_since feed; deleted_since carries the signal."""
    store = _store(spark, tmp_path)
    store.append(make_df(spark, [stmt(id="a", entity_id="e1", origin="base")]))
    v1 = store.commits.current_version()
    store.append(make_df(spark, [stmt(id="b", entity_id="e2", origin="late")]))
    v2 = store.commits.current_version()
    store.restore(v1)  # empties the origin=late partition

    # the additive feed cannot show e2 (no live rows) — by contract
    assert store.raw_since(v2).filter("entity_id = 'e2'").count() == 0
    deleted = store.deleted_since(v2)
    assert [r["entity_id"] for r in deleted.collect()] == ["e2"]
    # a span with no restore reports nothing
    assert store.deleted_since(store.commits.current_version()).count() == 0

    # restore FORWARD again: e2 is live at head → no deletion reported
    store.restore(v2)
    assert store.deleted_since(v1).count() == 0
    assert store.raw_since(v1).filter("entity_id = 'e2'").count() > 0


def test_deleted_since_refuses_after_vacuum(spark, tmp_path):
    """Pre-restore files gone → deletions are unreconstructible; the
    answer must be a loud reset-your-cursor error, never a silent []"""
    store = _store(spark, tmp_path)
    store.append(make_df(spark, [stmt(id="a", entity_id="e1", origin="base")]))
    v1 = store.commits.current_version()
    store.append(make_df(spark, [stmt(id="b", entity_id="e2", origin="late")]))
    v2 = store.commits.current_version()
    store.restore(v1)
    store.vacuum(retention_hours=0.0)  # reaps the rolled-back file
    with pytest.raises(RuntimeError, match="vacuumed"):
        store.deleted_since(v2)


# ---------------------------------------------------------------- fuzz
# (round-4 VERDICT item 7): random append/rewrite/restore/vacuum
# interleavings. Invariants:
#   (a) no commit's live snapshot ever references a vacuumed file —
#       the head read set is always fully on disk;
#   (b) restore either succeeds EXACTLY (live rows == the recorded
#       state at the target version) or refuses loudly naming the
#       vacuumed file / truncated log — never a silent partial state.
# Statement ids are unique per append so merge is content-neutral
# (physical rewrite only), letting a pure-Python model track the
# expected live id set per version.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _op_scripts(draw):
    n = draw(st.integers(min_value=4, max_value=9))
    ops = []
    for _ in range(n):
        op = draw(st.sampled_from(["append", "append", "merge", "restore", "vacuum"]))
        ops.append((op, draw(st.integers(0, 999)) if op == "restore" else 0))
    return ops


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(_op_scripts())
@pytest.mark.slow
def test_restore_vacuum_interleaving_fuzz(spark, tmp_path_factory, ops):
    import pytest as _pytest

    from ftm_lakehouse_spark.sources.commits import LogTruncated

    tmp_path = tmp_path_factory.mktemp("fuzz")
    store = _store(spark, tmp_path)
    counter = 0
    states: dict[int, frozenset] = {0: frozenset()}
    expected: frozenset = frozenset()

    def check():
        data = store._data_path()
        for f in store.commits.snapshot():  # invariant (a)
            assert store._fs.exists(store._fs.join(data, f)), f
        got = frozenset(r["id"] for r in store.raw().collect())
        assert got == expected  # the model is never silently wrong

    for op, pick in ops:
        if op == "append":
            rows = [
                stmt(id=f"s{counter + i}", entity_id=f"e{(counter + i) % 3}",
                     value=f"v{counter + i}")
                for i in range(2)
            ]
            counter += 2
            store.append(make_df(spark, rows))
            expected = expected | {r["id"] for r in rows}
        elif op == "merge":
            store.merge(grace_days=100000, force=True)  # rewrite, content-neutral
        elif op == "restore":
            head = store.commits.current_version()
            if head < 1:
                continue
            target = 1 + pick % head
            if target not in states:
                continue  # version predates model tracking (never happens)
            try:
                res = store.restore(target)
            except (RuntimeError, LogTruncated) as e:
                assert "vacuum" in str(e) or "reconstructible" in str(e)
                check()
                continue
            if res["restored"]:
                expected = states[target]
        else:  # vacuum: no logical change, may shrink restore reach
            store.vacuum(retention_hours=0.0)
        states[store.commits.current_version()] = expected
        check()
