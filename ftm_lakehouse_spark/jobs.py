"""Job-run records: persisted operation lifecycle.

Reference semantics: ``JobModel`` (reference model/job.py) carries
run_id / started / stopped / last_updated / pending / done / errors /
running / exc / took; ``JobRepository`` (reference
repository/job.py:18-119) persists one JSON record per run keyed by
(job type, run_id), where run_id embeds the start timestamp so
``latest()`` is "last key in sorted order", and ``run()`` is a context
manager that starts the job on entry, records the exception on
failure, and stops it on exit.

Spark realization: a control-file sidecar under
``<dataset>/_meta/jobs/<name>/<run_id>.json`` behind the same FS shim
the tag/version stores use (S16 — records live next to the data on
``file://``/``s3a://``/``gs://`` alike). Deliberately NOT a Spark
table: records are written once per job transition and read by
monitoring calls — driver-side JSON is the right cost, exactly like
the reference's anystore-backed repository. One difference kept
deliberate: a clean stop records ``exc = None`` (the reference's
``stop()`` stringifies ``None`` into ``"None"`` — a wart, not a
contract)."""

from __future__ import annotations

import json
import uuid
from dataclasses import asdict, dataclass, field
from datetime import datetime, timezone
from typing import Iterator

from ftm_lakehouse_spark.sources.fs import get_fs

__all__ = ["JobRecord", "JobRun", "JobStore"]


def _now() -> datetime:
    return datetime.now(timezone.utc)


def _make_run_id() -> str:
    """Sortable run id: UTC timestamp prefix + entropy suffix — the
    reference relies on run ids sorting chronologically so ``latest()``
    is the last key in lexicographic order (repository/job.py:84-96)."""
    return f"{_now():%Y%m%d%H%M%S%f}-{uuid.uuid4().hex[:8]}"


@dataclass
class JobRecord:
    """One operation run (reference ``DatasetJobModel``)."""

    name: str
    dataset: str
    run_id: str = field(default_factory=_make_run_id)
    started: datetime | None = None
    stopped: datetime | None = None
    last_updated: datetime | None = None
    pending: int = 0
    done: int = 0
    errors: int = 0
    running: bool = False
    exc: str | None = None
    took_seconds: float = 0.0
    #: free-form op result payload (rows written, files removed, …)
    result: dict | None = None

    def touch(self) -> None:
        self.last_updated = _now()

    def stop(self, exc: Exception | None = None) -> None:
        """Reference ``JobModel.stop``: mark not-running, stamp the
        stop time, record the failure, derive ``took``."""
        self.running = False
        self.stopped = _now()
        if exc is not None:
            self.exc = str(exc)
            self.errors += 1
        if self.started is not None:
            self.took_seconds = (self.stopped - self.started).total_seconds()

    def to_dict(self) -> dict:
        d = asdict(self)
        for k in ("started", "stopped", "last_updated"):
            if d[k] is not None:
                d[k] = d[k].isoformat()
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "JobRecord":
        d = dict(d)
        for k in ("started", "stopped", "last_updated"):
            if d.get(k):
                d[k] = datetime.fromisoformat(d[k])
        return cls(**d)


class JobRun:
    """Lifecycle handle (reference ``JobRun``): ``start`` persists the
    running record, ``save`` persists mid-run progress, ``stop``
    finalizes — each transition is one sidecar write."""

    def __init__(self, store: "JobStore", job: JobRecord):
        self.store = store
        self.job = job

    def start(self) -> None:
        self.job.started = _now()
        self.job.running = True
        self.store.put(self.job)

    def save(self, **updates) -> None:
        """Periodic progress save; ``pending``/``done``/``errors``
        counters (and ``result``) can be updated in place."""
        for k, v in updates.items():
            if not hasattr(self.job, k):
                raise AttributeError(f"JobRecord has no field {k!r}")
            setattr(self.job, k, v)
        self.job.touch()
        self.store.put(self.job)

    def stop(self, exc: Exception | None = None) -> JobRecord:
        self.job.stop(exc)
        self.store.put(self.job)
        return self.job


class JobStore:
    """Per-dataset run history (reference ``JobRepository``)."""

    def __init__(self, root: str, spark=None):
        self.root = root
        self._fs = get_fs(root, spark)

    # ------------------------------------------------------- storage
    def _path(self, name: str, run_id: str) -> str:
        return self._fs.join(self.root, name, f"{run_id}.json")

    def put(self, job: JobRecord) -> None:
        path = self._path(job.name, job.run_id)
        self._fs.mkdirs(self._fs.join(self.root, job.name))
        self._fs.write_text_atomic(path, json.dumps(job.to_dict()))

    def get(self, name: str, run_id: str) -> JobRecord:
        return JobRecord.from_dict(
            json.loads(self._fs.read_text(self._path(name, run_id)))
        )

    def delete(self, name: str, run_id: str) -> None:
        self._fs.delete(self._path(name, run_id))

    def _run_ids(self, name: str) -> list[str]:
        d = self._fs.join(self.root, name)
        if not self._fs.isdir(d):
            return []
        return sorted(
            f[: -len(".json")] for f in self._fs.listdir(d) if f.endswith(".json")
        )

    def job_types(self) -> list[str]:
        if not self._fs.isdir(self.root):
            return []
        return sorted(self._fs.listdir(self.root))

    # -------------------------------------------------------- queries
    def latest(self, name: str) -> JobRecord | None:
        """Newest run of a job type — run ids embed the start timestamp
        so the last id in sorted order is the latest run."""
        ids = self._run_ids(name)
        return self.get(name, ids[-1]) if ids else None

    def iterate(self, name: str) -> Iterator[JobRecord]:
        """All runs of a job type, oldest first."""
        for run_id in self._run_ids(name):
            yield self.get(name, run_id)

    # ------------------------------------------------------ lifecycle
    def run(self, name: str, dataset: str = "", **fields) -> "_RunContext":
        """Context manager running one operation under a persisted
        lifecycle record: started on entry, exception captured and
        re-raised on failure, stopped on exit (reference
        repository/job.py:99-119)."""
        return _RunContext(self, JobRecord(name=name, dataset=dataset, **fields))


class _RunContext:
    def __init__(self, store: JobStore, job: JobRecord):
        self._run = JobRun(store, job)

    def __enter__(self) -> JobRun:
        self._run.start()
        return self._run

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc is not None:
            self._run.stop(exc)
            return False  # re-raise, like the reference
        if self._run.job.running:  # only stop if not already stopped
            self._run.stop()
        return False
