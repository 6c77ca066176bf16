"""Commit-log atomicity strategies (round-2 VERDICT item 5): native
atomic create, the read-back fence on non-atomic stores (S3A
copy-rename), and the delta-rs-style lock client. No Spark needed —
the log is pure control plane."""

import json
import threading

import pytest

from ftm_lakehouse_spark.sources.commits import (
    CommitConflict,
    CommitLog,
    FileLockClient,
)
from ftm_lakehouse_spark.sources.fs import LocalFS


class NonAtomicFS(LocalFS):
    """Models S3A without conditional writes: 'exclusive' create is a
    blind overwrite that always reports success — last writer wins
    silently unless the log fences."""

    atomic_put_if_absent = False

    def __init__(self):
        self.interloper = None  # (path_suffix, content) injected mid-race

    def write_text_exclusive(self, p, data):
        self.write_text_atomic(p, data)
        if self.interloper and p.endswith(self.interloper[0]):
            # a concurrent writer's copy lands right after ours —
            # the S3A copy-rename hazard, deterministically simulated
            self.write_text_atomic(p, self.interloper[1])
        return True


def _log(tmp_path, fs=None, name="log", **kw):
    fs = fs or LocalFS()
    root = str(tmp_path / name)
    fs.mkdirs(root)
    return CommitLog(fs, root, **kw), fs


def test_non_atomic_store_single_writer_still_works(tmp_path):
    log, _ = _log(tmp_path, NonAtomicFS())
    assert log.commit("append", [("s",)], files_added=["a.parquet"]) == 1
    assert log.commit("append", [("s",)], files_added=["b.parquet"]) == 2
    assert log.snapshot() == ["a.parquet", "b.parquet"]


def test_non_atomic_store_late_racer_loses_cleanly(tmp_path):
    """A second writer arriving AFTER a version is visible loses via
    the exists-check and retries the next version — no overwrite."""
    fs = NonAtomicFS()
    log_a, _ = _log(tmp_path, fs)
    log_b = CommitLog(fs, log_a.root)
    assert log_a.commit("append", [("s",)], files_added=["a.parquet"]) == 1
    assert log_b.commit("append", [("s",)], files_added=["b.parquet"]) == 2
    rec1 = json.loads(fs.read_text(log_a._path(1)))
    assert rec1["files_added"] == ["a.parquet"]  # not clobbered


def test_non_atomic_store_detects_simultaneous_overwrite_loudly(tmp_path):
    """The S3A hazard itself: a concurrent copy lands between our
    write and read-back. Must raise CommitConflict naming the broken
    deployment assumption — NOT report success while another writer's
    record sits under our version number."""
    fs = NonAtomicFS()
    log, _ = _log(tmp_path, fs)
    foreign = json.dumps({"version": 1, "kind": "append", "writer": "other",
                          "partitions": [], "files_added": ["theirs.parquet"],
                          "files_removed": [], "ts": "2026-01-01T00:00:00+00:00"})
    fs.interloper = ("000000000001.json", foreign)
    with pytest.raises(CommitConflict, match="lock client"):
        log.commit("append", [("s",)], files_added=["ours.parquet"])


def test_lock_client_serializes_writers_on_non_atomic_store(tmp_path):
    """With the lock client, the same non-atomic store hosts multiple
    writers correctly: the lock holds across check+write, so every
    commit gets a distinct version and no record is overwritten."""
    fs = NonAtomicFS()
    # lock files themselves need an atomic create — point the lock
    # client at a store that has one (the delta-rs DynamoDB split:
    # data on S3, lock elsewhere)
    lock_fs = LocalFS()
    log_a, _ = _log(tmp_path, fs, lock_client=FileLockClient(lock_fs))
    log_b = CommitLog(fs, log_a.root, lock_client=FileLockClient(lock_fs))

    results = []

    def writer(log, tag):
        for i in range(5):
            v = log.commit("append", [("s",)], files_added=[f"{tag}{i}.parquet"])
            results.append((tag, v))

    t1 = threading.Thread(target=writer, args=(log_a, "a"))
    t2 = threading.Thread(target=writer, args=(log_b, "b"))
    t1.start(); t2.start(); t1.join(); t2.join()

    versions = sorted(v for _, v in results)
    assert versions == list(range(1, 11))  # every commit a distinct version
    assert len(log_a.snapshot()) == 10  # nothing lost, nothing clobbered
    # lock released: no stale .lock file remains
    assert not lock_fs.exists(log_a.root.rstrip("/") + ".lock")


def test_expired_lock_lease_is_broken(tmp_path):
    fs = LocalFS()
    root = str(tmp_path / "log")
    fs.mkdirs(root)
    # a crashed holder left an expired lease behind
    fs.write_text_exclusive(
        root + ".lock", json.dumps({"token": "dead", "expires": 0})
    )
    client = FileLockClient(fs, ttl_seconds=60)
    token = client.acquire(root)  # breaks the lease instead of stalling
    held = json.loads(fs.read_text(root + ".lock"))
    assert held["token"] == token
    client.release(root, token)
    assert not fs.exists(root + ".lock")


def test_lease_break_cannot_remove_a_successors_live_lock(tmp_path):
    """The lease-break race (round-3 review finding): waiter A breaks an
    expired lease and acquires a VALID lock; waiter B, still holding the
    stale payload it read earlier, then executes its break. B's break
    must NOT remove A's live lock — the original unconditional delete
    did exactly that, yielding two concurrent holders."""
    import time as _time

    fs = LocalFS()
    root = str(tmp_path / "locked")
    fs.mkdirs(root)
    client = FileLockClient(fs, ttl_seconds=60)
    path = client._lock_path(root)

    expired = {"token": "dead-writer", "expires": _time.time() - 100}
    fs.write_text_atomic(path, json.dumps(expired))

    # waiter A: sees the expired lease, breaks it, acquires
    token_a = client.acquire(root)
    live = json.loads(fs.read_text(path))
    assert live["token"] == token_a

    # waiter B: executes the break it queued against the OLD payload
    client._break_lease(path, expired)

    # A's live lock survived — B re-races instead of deleting it
    held = json.loads(fs.read_text(path))
    assert held["token"] == token_a
    client.release(root, token_a)


def test_lease_break_restores_a_claimed_live_lock(tmp_path):
    """If the atomic claim (rename) lands on a LIVE lock — created
    inside the breaker's read→rename window — the breaker restores it
    instead of deleting it."""
    import time as _time

    fs = LocalFS()
    root = str(tmp_path / "locked2")
    fs.mkdirs(root)
    client = FileLockClient(fs, ttl_seconds=60)
    path = client._lock_path(root)

    stale = {"token": "dead-writer", "expires": _time.time() - 100}
    live = {"token": "fresh-writer", "expires": _time.time() + 1000}
    fs.write_text_atomic(path, json.dumps(live))

    client._break_lease(path, stale)  # breaker saw `stale`, claims `live`
    held = json.loads(fs.read_text(path))
    assert held["token"] == "fresh-writer"  # restored, not reaped


def test_lock_branch_fences_against_broken_lock_overwrite(tmp_path):
    """With a lock client configured, a publish whose bytes are
    overwritten by a concurrent writer (possible only when the lock was
    operator-broken or lease-expired mid-publish) must raise
    CommitConflict, not silently lose the other writer's commit."""
    fs = NonAtomicFS()
    log, _ = _log(tmp_path, fs, name="fenced", lock_client=FileLockClient(fs))

    # interloper bytes land right after ours, under the lock: models a
    # second writer whose lock acquisition succeeded because ours was
    # broken (write_text_atomic routes through write_text_exclusive in
    # NonAtomicFS only for the injected suffix)
    foreign = json.dumps({"version": 1, "kind": "append", "writer": "other"})
    orig = fs.write_text_atomic

    def sabotage(p, data):
        orig(p, data)
        if p.endswith("000000000001.json"):
            orig(p, foreign)

    fs.write_text_atomic = sabotage
    with pytest.raises(CommitConflict):
        log.commit("append", [("s",)], files_added=["a.parquet"])


class ChaosLockClient(FileLockClient.__bases__[0]):
    """Fault-injecting lock service (round-6 VERDICT item 5): models a
    split-brain / lease-expiring external lock so the commit path's
    safety can be tested under a BROKEN mutual-exclusion provider.

    Deterministic schedule by acquire counter:
      * every ``dup_every``-th acquire is granted WITHOUT holding the
        mutex (duplicate grant — a split-brain lock service or a
        wrongly-broken lease);
      * every ``lose_every``-th acquire is revoked immediately after
        being granted (the mutex is released behind the holder's back
        — lease expiry mid-commit), so the next acquirer proceeds
        while the 'holder' still believes it holds;
      * release() of a duplicate/lost token is a no-op on the mutex
        (the successor owns it after the takeover), and release() of a
        healthy token frees it — so a stale holder can never free a
        successor's lock.
    """

    def __init__(self, dup_every=0, lose_every=0):
        import threading

        self._sem = threading.Semaphore(1)
        self._mu = threading.Lock()
        self._n = 0
        self.dup_every = dup_every
        self.lose_every = lose_every

    def acquire(self, key):
        with self._mu:
            self._n += 1
            n = self._n
        if self.dup_every and n % self.dup_every == 0:
            return f"dup-{n}"  # granted while another writer holds
        self._sem.acquire()
        if self.lose_every and n % self.lose_every == 0:
            self._sem.release()  # lease revoked behind the holder's back
            return f"lost-{n}"
        return f"tok-{n}"

    def release(self, key, token):
        if token.startswith("tok-"):
            self._sem.release()


def test_chaos_lock_takeover_release_is_a_noop(tmp_path):
    """Stale-lock takeover: a holder whose lease was revoked must not
    be able to free the SUCCESSOR's lock on release — otherwise the
    takeover chain re-opens the split-brain it just closed."""
    chaos = ChaosLockClient(lose_every=1)  # every grant is revoked
    t1 = chaos.acquire("k")  # lost token; mutex available again
    assert t1.startswith("lost-")
    chaos.lose_every = 0
    t2 = chaos.acquire("k")  # successor takes over, healthy grant
    assert t2.startswith("tok-")
    chaos.release("k", t1)  # stale holder releases — must be a no-op
    assert not chaos._sem.acquire(blocking=False)  # successor still holds
    chaos.release("k", t2)
    assert chaos._sem.acquire(blocking=False)  # now actually free
    chaos._sem.release()


def test_chaos_lock_storm_exactly_one_wins_no_torn_log(tmp_path):
    """Two committers race 8 commits each through a lock service that
    duplicates every 3rd grant and revokes every 5th lease, over a
    store WITH atomic create (the belt-and-braces split: lock for
    liveness, store's put-if-absent for safety). Invariants that must
    hold under ANY interleaving: contiguous versions, every version
    file a complete record from exactly one writer (no torn bytes),
    every logical commit lands exactly once, snapshot == union of
    winners' files."""
    fs = LocalFS()
    root = str(tmp_path / "chaoslog")
    fs.mkdirs(root)
    chaos = ChaosLockClient(dup_every=3, lose_every=5)
    log_a = CommitLog(fs, root, lock_client=chaos)
    log_b = CommitLog(fs, root, lock_client=chaos)

    wins: dict[str, list[int]] = {"a": [], "b": []}

    def writer(log, tag):
        for i in range(8):
            for _ in range(20):  # app-level retry on detected conflicts
                try:
                    v = log.commit(
                        "append", [("s",)], files_added=[f"{tag}{i}.parquet"]
                    )
                    wins[tag].append(v)
                    break
                except CommitConflict:
                    continue
            else:
                raise AssertionError(f"{tag}{i} never committed")

    t1 = threading.Thread(target=writer, args=(log_a, "a"))
    t2 = threading.Thread(target=writer, args=(log_b, "b"))
    t1.start(); t2.start(); t1.join(); t2.join()

    head = log_a.current_version()
    assert head == 16  # every commit a distinct version, none skipped
    recs = [json.loads(fs.read_text(log_a._path(v))) for v in range(1, head + 1)]
    # no torn log: every version file is one writer's complete record,
    # its embedded version matching its file name
    for v, rec in zip(range(1, head + 1), recs):
        assert rec["version"] == v
        assert rec["writer"] in {log_a._writer, log_b._writer}
    # exactly-once: each logical commit appears exactly once in the log
    files = [f for rec in recs for f in rec["files_added"]]
    assert sorted(files) == sorted(
        [f"a{i}.parquet" for i in range(8)] + [f"b{i}.parquet" for i in range(8)]
    )
    assert set(log_a.snapshot()) == set(files)
    # and each writer's reported win versions match the log's attribution
    for tag, log in (("a", log_a), ("b", log_b)):
        for v in wins[tag]:
            assert json.loads(fs.read_text(log._path(v)))["writer"] == log._writer
