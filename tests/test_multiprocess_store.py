"""Two-DRIVER committer storm + kill -9 crash sweep (round-7 VERDICT
item 4). test_concurrency proves the protocol with threads of one JVM
and with bare CommitLog processes; the MVCC log's real claim is
CROSS-DRIVER safety — here two separate python processes, each with
its OWN SparkSession/JVM, append and merge one shared store
concurrently, and a third is SIGKILLed mid-commit to prove the
orphan-stage story. Reference parity: the reference gets this from
delta-rs's optimistic commit protocol (storage/parquet.py:326-475);
this is the same guarantee on the reimplemented log."""

import pytest
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: worker: its own SparkSession (separate JVM), >= 8 commits — appends
#: with unique origins plus interleaved merges (merge conflicts are a
#: legal outcome of the race: the loser reports, nothing is lost).
_WORKER = """
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from ftm_lakehouse_spark.lakehouse import Lakehouse
from ftm_lakehouse_spark.sources.commits import CommitConflict
sys.path.insert(0, {repo!r} + "/tests")
from test_lakehouse import JANE, entities_df

wid, root, n_appends = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = (SparkSession.builder.master("local[4]")
         .config("spark.driver.memory", "2g")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
ds = Lakehouse(spark, root).dataset("storm")
done, merges = [], []
for i in range(n_appends):
    origin = f"w{{wid}}_c{{i}}"
    ds.write_entities(entities_df(spark, JANE), origin=origin)
    done.append(origin)
    if i % 3 == 2:  # interleave merges into the storm
        try:
            merges.append(bool(ds.merge(force=True)))
        except CommitConflict:
            merges.append("conflict")
print(json.dumps({{"origins": done, "merges": merges}}))
spark.stop()
"""

#: crash worker: appends forever until SIGKILLed mid-commit.
_CRASHER = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from ftm_lakehouse_spark.lakehouse import Lakehouse
sys.path.insert(0, {repo!r} + "/tests")
from test_lakehouse import JANE, entities_df

root = sys.argv[1]
spark = (SparkSession.builder.master("local[2]")
         .config("spark.driver.memory", "1g")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
ds = Lakehouse(spark, root).dataset("storm")
i = 0
while True:
    ds.write_entities(entities_df(spark, JANE), origin=f"crash_{{i}}")
    print(f"committed crash_{{i}}", flush=True)
    i += 1
"""


def _run_worker(wid: str, root: str, n: int):
    return subprocess.Popen(
        [sys.executable, "-c", _WORKER.format(repo=REPO), wid, root, str(n)],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=REPO,
    )


@pytest.mark.slow
def test_two_driver_committer_storm(spark, lake_root):
    """Invariants after two real drivers storm one store with >= 8
    commits each: contiguous versions, every logical commit exactly
    once, no file tracked by two commits, snapshot == the union of the
    winners' live files, and the merged view stays correct."""
    from ftm_lakehouse_spark.lakehouse import Lakehouse

    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("storm")  # pre-create: the create race is not under test
    n = 8
    procs = [_run_worker(w, lake_root, n) for w in ("1", "2")]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    log = ds.store.commits
    head = log.current_version()
    records = list(log.read(since=0))
    # contiguous versions, no holes, no duplicates
    versions = [r["version"] for r in records]
    assert versions == list(range(1, head + 1))
    # every append landed exactly once (origin encoded in the partition
    # paths of the commit's files)
    all_origins = [o for out in outs for o in out["origins"]]
    assert len(all_origins) == 2 * n
    appended = [r for r in records if r["kind"] == "append"]
    got_origins: set[str] = set()
    for r in appended:
        os_in_commit = {
            seg.split("=", 1)[1]
            for f in r["files_added"]
            for seg in f.split("/")
            if seg.startswith("origin=")
        }
        dup = os_in_commit & got_origins
        assert not dup, f"origin committed twice: {dup}"
        got_origins |= os_in_commit
    assert got_origins >= set(all_origins)
    # no file tracked by two commits
    seen_files: set[str] = set()
    for r in records:
        added = set(r["files_added"])
        assert not (added & seen_files), "file tracked by two commits"
        seen_files |= added
    # snapshot == winners' live files, all physically present
    live = set(log.snapshot())
    fs, data = ds.store._fs, ds.store._data_path()
    assert all(fs.exists(fs.join(data, f)) for f in live)
    # the data plane agrees: every origin's statements are readable and
    # the canonical view still dedupes to the single entity
    raw_origins = {
        r["origin"]
        for r in ds.store.raw().select("origin").distinct().collect()
    }
    assert raw_origins >= set(all_origins)
    assert ds.entities().count() == 1  # same JANE from every origin


def test_kill9_mid_commit_then_sweep(spark, lake_root):
    """SIGKILL a committing driver, then prove the store's crash
    story: the log has no torn record (contiguous versions, every
    record parseable), only fully-committed origins are visible, a new
    commit from a fresh driver succeeds, and vacuum reaps the crashed
    writer's orphan stage dirs / untracked files."""
    from ftm_lakehouse_spark.lakehouse import Lakehouse

    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("storm")
    before = ds.store.commits.current_version()

    p = subprocess.Popen(
        [sys.executable, "-c", _CRASHER.format(repo=REPO), lake_root],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=REPO,
    )
    # wait until it has really committed at least twice, then SIGKILL
    # it mid-loop — the kill lands somewhere inside a stage/commit
    committed = 0
    deadline = time.time() + 300
    while committed < 2 and time.time() < deadline:
        line = p.stdout.readline()
        if line.startswith("committed"):
            committed += 1
    assert committed >= 2, "crasher never committed"
    os.kill(p.pid, signal.SIGKILL)
    p.wait(60)

    log = ds.store.commits
    head = log.current_version()
    records = list(log.read(since=0))
    assert [r["version"] for r in records] == list(range(1, head + 1))
    assert head >= before + 2
    # only committed origins are visible in raw(); a torn write would
    # surface a crash_i with no commit record
    crash_committed = {
        seg.split("=", 1)[1]
        for r in records
        for f in r["files_added"]
        for seg in f.split("/")
        if seg.startswith("origin=crash_")
    }
    visible = {
        r["origin"]
        for r in ds.store.raw().select("origin").distinct().collect()
        if r["origin"].startswith("crash_")
    }
    assert visible == crash_committed
    # fresh driver commits cleanly on top
    from .test_lakehouse import JANE, entities_df

    ds.write_entities(entities_df(spark, JANE), origin="post_crash")
    assert log.current_version() == head + 1
    # sweep: orphan stage dirs and untracked data files are reaped
    ds.store.vacuum(retention_hours=0.0)
    fs = ds.store._fs
    stages = [n for n in fs.listdir(ds.store.path) if n.startswith("_stage-")]
    assert stages == []
    data = ds.store._data_path()
    tracked = log.tracked_files()
    untracked = fs.parquet_files(data) - tracked - set(log.snapshot())
    assert untracked == set()
    # the store still reads end-to-end
    assert ds.entities().count() == 1


_ADOPTER = """
import json, sys
sys.path.insert(0, {repo!r})
from ftm_lakehouse_spark.sources.statement_store import StatementStore
from ftm_lakehouse_spark.model.dataset import DatasetConfig

root = sys.argv[1]
# adopt is pure control plane: no SparkSession in the worker at all
st = StatementStore(None, root, DatasetConfig(name="foreign", shards=2))
print(json.dumps(st.adopt() | {{"head": st.commits.current_version()}}))
"""


def test_cross_process_adopt_race(tmp_path):
    """N spark-free processes adopt the same pre-log foreign store
    concurrently: exactly ONE bootstrap commit lands (put-if-absent),
    every process converges on version 1, and the adopted snapshot is
    exactly the directory's parquet listing."""
    import glob

    store_root = str(tmp_path / "foreign")
    data = os.path.join(store_root, "statements", "shard=0", "bucket=thing",
                        "origin=bulk")
    os.makedirs(data)
    names = []
    for i in range(3):
        p = os.path.join(data, f"part-{i:03d}.snappy.parquet")
        open(p, "wb").write(b"PAR1-fake-" + str(i).encode())
        names.append(p)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _ADOPTER.format(repo=REPO), store_root],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for _ in range(4)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    # every process converged on the same owned version-1 store
    assert all(o["head"] == 1 for o in outs), outs
    # exactly one bootstrap record in the log
    log_dir = os.path.join(store_root, "_meta", "commits")
    records = [f for f in os.listdir(log_dir) if f.endswith(".json")
               and not f.startswith("checkpoint-")]
    assert records == ["000000000001.json"], records
    rec = json.load(open(os.path.join(log_dir, records[0])))
    assert rec["kind"] == "bootstrap"
    assert sorted(rec["files_added"]) == sorted(
        os.path.relpath(n, os.path.join(store_root, "statements")).replace(os.sep, "/")
        for n in names
    )


def test_adopt_converges_inside_winner_window(tmp_path):
    """Round-12: a store constructed inside another adopter's
    mkdirs→bootstrap window (log dir exists, zero records, data
    present) classifies as owned-at-v0; explicit adopt() must wait out
    the in-flight winner and converge on version 1 instead of
    reporting head 0."""
    import threading

    from ftm_lakehouse_spark.model.dataset import DatasetConfig
    from ftm_lakehouse_spark.sources.statement_store import StatementStore

    root = str(tmp_path / "foreign")
    data = os.path.join(root, "statements", "shard=0", "bucket=thing",
                        "origin=bulk")
    os.makedirs(data)
    for i in range(3):
        open(os.path.join(data, f"part-{i:03d}.snappy.parquet"), "wb").write(
            b"PAR1-fake-" + str(i).encode()
        )
    # the winner, paused mid-window: log dir created, record not yet
    winner = StatementStore(None, root, DatasetConfig(name="foreign", shards=2))
    assert winner._adopting
    winner._fs.mkdirs(winner.commits.root)

    # the loser constructs INSIDE the window
    loser = StatementStore(None, root, DatasetConfig(name="foreign", shards=2))
    assert not loser._adopting

    results = {}

    def late_adopt():
        results["loser"] = loser.adopt(wait_s=10.0)

    t = threading.Thread(target=late_adopt)
    t.start()
    time.sleep(0.3)  # loser is polling
    results["winner"] = winner.adopt()
    t.join(timeout=15)
    assert not t.is_alive()
    assert results["winner"] == {"adopted": True, "version": 1}
    assert results["loser"] == {"adopted": False, "version": 1}
    assert loser.commits.current_version() == 1


def test_adopt_crashed_midflight_needs_force(tmp_path):
    """If the racing winner CRASHED between mkdirs and the bootstrap
    record, owned-at-v0-with-data is indistinguishable from an engine
    store's torn first append — the poll times out and the store stays
    v0 (never auto-fold). force=True is the operator override that
    folds the directory listing."""
    from ftm_lakehouse_spark.model.dataset import DatasetConfig
    from ftm_lakehouse_spark.sources.statement_store import StatementStore

    root = str(tmp_path / "foreign")
    data = os.path.join(root, "statements", "shard=0", "bucket=thing",
                        "origin=bulk")
    os.makedirs(data)
    names = []
    for i in range(3):
        p = os.path.join(data, f"part-{i:03d}.snappy.parquet")
        open(p, "wb").write(b"PAR1-fake-" + str(i).encode())
        names.append(f"shard=0/bucket=thing/origin=bulk/part-{i:03d}.snappy.parquet")
    crashed = StatementStore(None, root, DatasetConfig(name="foreign", shards=2))
    crashed._fs.mkdirs(crashed.commits.root)  # crash right here

    st = StatementStore(None, root, DatasetConfig(name="foreign", shards=2))
    assert not st._adopting
    out = st.adopt(wait_s=0.2)
    assert out == {"adopted": False, "version": 0}

    out = st.adopt(force=True)
    assert out == {"adopted": True, "version": 1}
    assert sorted(st.commits.snapshot(1)) == sorted(names)
    # idempotent afterwards, with or without force
    assert st.adopt(force=True)["version"] == 1
    assert st.adopt()["version"] == 1
