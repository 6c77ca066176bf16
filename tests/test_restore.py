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
