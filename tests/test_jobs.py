"""Job-run records: lifecycle parity with the reference JobRepository
(repository/job.py:18-119, model/job.py) — persisted start/stop/error
records, latest()/iterate() history, and the API GET routes."""

import time

import pytest

from ftm_lakehouse_spark.jobs import JobRecord, JobStore


def test_run_lifecycle_success(tmp_path):
    store = JobStore(str(tmp_path / "jobs"))
    with store.run("optimize", dataset="d1") as run:
        assert run.job.running is True
        assert run.job.started is not None
        # the running record is already durable mid-flight
        live = store.get("optimize", run.job.run_id)
        assert live.running is True and live.stopped is None
        run.save(pending=5, done=3)
    rec = store.get("optimize", run.job.run_id)
    assert rec.running is False
    assert rec.exc is None
    assert rec.stopped is not None and rec.stopped >= rec.started
    assert rec.took_seconds >= 0
    assert rec.pending == 5 and rec.done == 3
    assert rec.last_updated is not None


def test_run_lifecycle_failure_captured_and_reraised(tmp_path):
    store = JobStore(str(tmp_path / "jobs"))
    with pytest.raises(ValueError, match="boom"):
        with store.run("optimize", dataset="d1") as run:
            raise ValueError("boom")
    rec = store.get("optimize", run.job.run_id)
    assert rec.running is False
    assert rec.exc == "boom"
    assert rec.errors == 1
    assert rec.stopped is not None


def test_latest_and_iterate_ordering(tmp_path):
    store = JobStore(str(tmp_path / "jobs"))
    ids = []
    for _ in range(3):
        with store.run("vacuum", dataset="d1") as run:
            ids.append(run.job.run_id)
        time.sleep(0.002)  # run ids embed a microsecond timestamp
    assert [r.run_id for r in store.iterate("vacuum")] == sorted(ids)
    assert store.latest("vacuum").run_id == ids[-1]
    # job types are isolated
    assert store.latest("optimize") is None
    assert list(store.iterate("optimize")) == []
    assert store.job_types() == ["vacuum"]


def test_delete_and_save_validates_fields(tmp_path):
    store = JobStore(str(tmp_path / "jobs"))
    with store.run("make", dataset="d1") as run:
        with pytest.raises(AttributeError):
            run.save(nonsense=1)
    store.delete("make", run.job.run_id)
    assert store.latest("make") is None


def test_record_roundtrip():
    rec = JobRecord(name="optimize", dataset="d1")
    rec.stop()
    back = JobRecord.from_dict(rec.to_dict())
    assert back == rec


def test_operation_runs_are_persisted_on_dataset(spark, lake_root):
    from ftm_lakehouse_spark.api import NdjsonApi
    from ftm_lakehouse_spark.lakehouse import Lakehouse
    from tests.test_lakehouse import JANE, entities_df

    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("jobsds")
    ds.write_entities(entities_df(spark, JANE), origin="bulk")

    api = NdjsonApi(lake)
    res = api.run_operation("jobsds", "optimize", force=True)
    assert res["op"] == "optimize" and "run_id" in res

    rec = ds.jobs.latest("optimize")
    assert rec is not None
    assert rec.run_id == res["run_id"]
    assert rec.running is False and rec.exc is None
    assert rec.result["op"] == "optimize"
    assert rec.done == 1
    assert rec.dataset == "jobsds"

    # history accumulates, latest moves
    res2 = api.run_operation("jobsds", "vacuum")
    assert api.latest_job("jobsds", "vacuum")["run_id"] == res2["run_id"]
    allruns = api.list_jobs("jobsds")["runs"]
    assert {r["name"] for r in allruns} == {"optimize", "vacuum"}
    assert allruns[0]["run_id"] == max(r["run_id"] for r in allruns)


def test_jobs_routes_over_socket(spark, lake_root):
    import json
    import urllib.request

    from ftm_lakehouse_spark.api import serve_in_thread
    from ftm_lakehouse_spark.lakehouse import Lakehouse
    from tests.test_lakehouse import JANE, entities_df

    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("jobsrv")
    ds.write_entities(entities_df(spark, JANE), origin="bulk")

    server, base = serve_in_thread(lake)
    try:
        req = urllib.request.Request(
            f"{base}/jobsrv/operations",
            data=json.dumps({"name": "optimize", "force": True}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert out["op"] == "optimize" and out["run_id"]

        with urllib.request.urlopen(
            f"{base}/jobsrv/jobs/latest?name=optimize"
        ) as resp:
            latest = json.loads(resp.read())
        assert latest["run_id"] == out["run_id"]
        assert latest["running"] is False and latest["exc"] is None

        with urllib.request.urlopen(f"{base}/jobsrv/jobs") as resp:
            runs = json.loads(resp.read())["runs"]
        assert [r["run_id"] for r in runs].count(out["run_id"]) == 1

        # no runs for an unknown type → 404
        try:
            urllib.request.urlopen(f"{base}/jobsrv/jobs/latest?name=make")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
