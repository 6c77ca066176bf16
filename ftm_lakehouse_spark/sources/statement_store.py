"""StatementStore: the physical statement table.

One table per dataset, hive-partitioned by ``(shard, bucket, origin)``
(reference layout: /root/reference/ftm_lakehouse/storage/parquet.py:35-37,
95,112-122). Storage is plain partitioned parquet driven through Spark's
native committer:

  * **append** — ``partitionBy(...).mode("append")``. Concurrent
    appends from ONE driver are serialized by a per-path lock: Spark's
    default FileOutputCommitter shares ``<path>/_temporary`` across
    jobs writing the same path, so truly simultaneous appends can
    clobber each other's staging (the reference's marker fence,
    storage/parquet.py:326-475, guarded the same hazard). Cross-driver
    concurrency needs a transactional table format (Delta/Iceberg) —
    documented, not faked.
  * **merge rewrite** — dynamic partition overwrite
    (``spark.sql.sources.partitionOverwriteMode=dynamic``) rewrites only
    the partitions present in the canonicalized frame: the parquet
    analog of Delta ``replaceWhere`` (reference S4,
    storage/parquet.py:644-663).
  * **clustering** — ``sortWithinPartitions(entity_id, ...)`` before
    every write keeps an entity's rows contiguous within files so
    min/max stats skip files on point lookups (reference 7-key sort O1,
    storage/parquet.py:519-529).

At 100 TB: appends scale horizontally (no coordination), the merge
shuffles each dirty partition once (windows are keyed on the partition
prefix), and freshness tags skip clean partitions entirely.
"""

from __future__ import annotations

import json
import os
import threading
import time
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_lakehouse_spark.model.dataset import DatasetConfig
from ftm_lakehouse_spark.model.statement import (
    PARTITION_COLUMNS,
    STATEMENT_SCHEMA,
    WRITE_SORT_COLUMNS,
    live_filter,
    with_canonical_id,
)
from ftm_lakehouse_spark.operators.merge import canonicalize
from ftm_lakehouse_spark.sources.commits import CommitLog
from ftm_lakehouse_spark.sources.fs import get_fs

__all__ = ["StatementStore", "TagStore"]


def _lock_key(path: str) -> str:
    return path if "://" in path else os.path.abspath(path)


class TagStore:
    """Freshness tags: ``key -> iso timestamp`` (reference
    storage/tags.py:24-69). Drives partition-level merge skip and
    op-level "target newer than deps → skip" (I4). A tiny driver-side
    control file — deliberately not a Spark table: it is read per job,
    written once per job, and must be cheap. Lives behind the FS shim
    so a store rooted at a Hadoop URI keeps its tags next to its data
    (S16)."""

    _locks: dict[str, threading.Lock] = {}
    _locks_guard = threading.Lock()

    def __init__(self, path: str, spark: SparkSession | None = None):
        self.path = path
        self._fs = get_fs(path, spark)
        with TagStore._locks_guard:
            self._lock = TagStore._locks.setdefault(_lock_key(path), threading.Lock())

    def _load(self) -> dict[str, str]:
        try:
            return json.loads(self._fs.read_text(self.path))
        except FileNotFoundError:
            return {}

    def get(self, key: str) -> datetime | None:
        v = self._load().get(key)
        return datetime.fromisoformat(v) if v else None

    def touch(self, key: str, ts: datetime | None = None) -> None:
        # read-modify-write under a per-path lock: concurrent writers
        # (threaded appends) would otherwise drop each other's tags
        with self._lock:
            tags = self._load()
            tags[key] = (ts or datetime.now(timezone.utc)).isoformat()
            self._fs.write_text_atomic(self.path, json.dumps(tags))

    def is_latest(self, key: str, deps: list[str]) -> bool:
        """target newer than all deps → fresh (reference
        storage/tags.py:45-63)."""
        target = self.get(key)
        if target is None:
            return False
        for dep in deps:
            d = self.get(dep)
            if d is not None and d > target:
                return False
        return True


class StatementStore:
    #: per-table-path write locks (process-wide): the default Hadoop
    #: committer cannot handle two simultaneous jobs appending to one
    #: path — see class docstring. Reentrant so merge()/compact() can
    #: hold the lock across their read→canonicalize→swap span while
    #: overwrite_partitions acquires it again internally.
    _write_locks: dict[str, threading.RLock] = {}
    _write_locks_guard = threading.Lock()

    def __init__(self, spark: SparkSession, path: str, config: DatasetConfig):
        self.spark = spark
        self.path = path
        self.config = config
        self._fs = get_fs(path, spark)
        self.tags = TagStore(self._fs.join(path, "_meta", "tags.json"), spark)
        self.commits = CommitLog(self._fs, self._fs.join(path, "_meta", "commits"))
        with StatementStore._write_locks_guard:
            self._write_lock = StatementStore._write_locks.setdefault(
                _lock_key(path), threading.RLock()
            )

    # ---------------------------------------------------------- reads
    def _data_path(self) -> str:
        return self._fs.join(self.path, "statements")

    def exists(self) -> bool:
        return self._fs.isdir(self._data_path())

    def raw(self) -> DataFrame:
        """All physical rows including tombstones (reference
        ``statement_raw`` view, logic/parquet.py:49-69)."""
        if not self.exists():
            return self.spark.createDataFrame([], STATEMENT_SCHEMA)
        return self.spark.read.schema(STATEMENT_SCHEMA).parquet(self._data_path())

    def live(self) -> DataFrame:
        """Live view: tombstone-filtered + ``canonical_id`` alias,
        window-free so predicates push to file stats (reference
        ``statement`` view, logic/parquet.py:165-192)."""
        return with_canonical_id(self.raw().filter(live_filter()))

    # --------------------------------------------------------- writes
    @staticmethod
    def _partition_tag(shard: str, bucket: str, origin: str) -> str:
        return f"updated:{shard}/{bucket}/{origin}"

    def append(self, df: DataFrame) -> None:
        df = df.select(*STATEMENT_SCHEMA.fieldNames())
        touched = (
            df.select(*PARTITION_COLUMNS).distinct().collect()
        )
        with self._write_lock:
            # stamp per-partition freshness BEFORE data lands (crash-safe
            # ordering, reference storage/parquet.py:545-569) — a crash
            # between stamp and write leaves a partition marked dirty,
            # which merge treats as "re-check", never "skip". Stamped
            # INSIDE the lock so a merge serialized before this append
            # cannot stamp a newer optimized: over these tags.
            for r in touched:
                self.tags.touch(self._partition_tag(r["shard"], r["bucket"], r["origin"]))
            parts = [(r["shard"], r["bucket"], r["origin"]) for r in touched]
            before = self._list_partition_files(parts)
            (
                self._cluster_for_write(df)
                .write.mode("append")
                .options(**self._write_options())
                .partitionBy(*PARTITION_COLUMNS)
                .parquet(self._data_path())
            )
            added = self._list_partition_files(parts) - before
            self.commits.commit("append", parts, sorted(added))
        self.tags.touch("last_updated")

    def _list_partition_files(self, parts: list[tuple[str, str, str]]) -> set[str]:
        """Data-dir-relative parquet files in the given partitions —
        a listing scoped to the partitions one write touches, not the
        table (the cost a transaction log would avoid; see CommitLog)."""
        data = self._data_path()
        out: set[str] = set()
        for s, b, o in parts:
            rel = f"shard={s}/bucket={b}/origin={o}"
            for f in self._fs.parquet_files(self._fs.join(data, rel)):
                out.add(f"{rel}/{f}")
        return out

    @staticmethod
    def _write_options() -> dict[str, str]:
        """Parquet bloom filters on the point-lookup keys: with files
        clustered by entity_id, min/max stats skip most files and the
        bloom filter kills the rest without decoding pages (the engine's
        substitute for Delta ZORDER on lookups)."""
        return {
            "parquet.bloom.filter.enabled#entity_id": "true",
            "parquet.bloom.filter.expected.ndv#entity_id": "1000000",
            "parquet.bloom.filter.enabled#id": "true",
        }

    def _cluster_for_write(self, df: DataFrame) -> DataFrame:
        """Distribute rows for writing: partition columns + an
        entity-keyed salt. Hashing only the 3 partition columns would
        collapse a 1.8M-row write onto <#partitions> tasks; the salt
        multiplies fan-out while keeping every entity wholly inside one
        task, so the entity_id clustering sort still yields contiguous
        entities and tight min/max file stats."""
        import pyspark.sql.functions as _F

        fanout = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        salt = _F.pmod(_F.xxhash64("entity_id"), _F.lit(max(1, fanout // 4)))
        return (
            df.withColumn("_wsalt", salt)
            .repartition(fanout, *PARTITION_COLUMNS, "_wsalt")
            .drop("_wsalt")
            .sortWithinPartitions(*WRITE_SORT_COLUMNS)
        )

    def overwrite_partitions(
        self, df: DataFrame, expected: list[tuple[str, str, str]] | None = None
    ) -> None:
        """Partition-scoped overwrite: only partitions present in ``df``
        are replaced (merge rewrite / Delta ``replaceWhere`` analog).

        Spark cannot overwrite a path it is concurrently reading, so the
        rewrite stages to a sibling directory and swaps partition
        directories in. On a cluster this staging/commit is a table
        format's job (Delta/Iceberg); the local swap keeps identical
        semantics: untouched partitions stay byte-identical.

        ``expected``: partitions the caller rewrote. Any expected
        partition that produced NO output (every row reaped) has its
        live directory removed — without this, a fully-tombstoned
        partition would keep stale files forever.

        Holds the per-path write lock for the whole stage-write + swap:
        an append racing the swap would otherwise land files in a
        partition directory the swap is about to rmtree — silent loss."""
        fs = self._fs
        stage = fs.join(self.path, f"_stage-{time.monotonic_ns()}")
        with self._write_lock:
            (
                self._cluster_for_write(df.select(*STATEMENT_SCHEMA.fieldNames()))
                .write.mode("overwrite")
                .options(**self._write_options())
                .partitionBy(*PARTITION_COLUMNS)
                .parquet(stage)
            )
            data = self._data_path()
            fs.mkdirs(data)
            written: set[tuple[str, ...]] = set()
            for rel in fs.parquet_dirs(stage):
                parts = dict(p.split("=", 1) for p in rel.split("/") if "=" in p)
                if len(parts) == len(PARTITION_COLUMNS):
                    written.add(tuple(parts[c] for c in PARTITION_COLUMNS))
                fs.rename(fs.join(stage, rel), fs.join(data, rel))
            fs.delete(stage)
            for part in expected or []:
                if tuple(part) not in written:
                    s, b, o = part
                    fs.delete(
                        fs.join(data, f"shard={s}", f"bucket={b}", f"origin={o}")
                    )
            self.commits.commit(
                "rewrite", sorted(written | {tuple(p) for p in expected or []})
            )

    # ---------------------------------------------------- maintenance
    def dirty_partitions(self) -> list[tuple[str, str, str]]:
        """Partitions written since their last merge (per-partition
        ``updated:*`` vs ``optimized:*`` tags, reference
        storage/parquet.py:571-641)."""
        out = []
        for key in self.tags._load():
            if not key.startswith("updated:"):
                continue
            part = key.split(":", 1)[1]
            if not self.tags.is_latest(f"optimized:{part}", [key]):
                out.append(tuple(part.split("/")))
        return sorted(out)

    def merge(self, grace_days: int = 30, force: bool = False) -> bool:
        """Canonicalize dirty partitions in place — partition-scoped:
        clean partitions are neither read nor rewritten. At 100 TB this
        bounds a merge to the partitions actually appended to since the
        last one (the reference's per-partition loop, here one Spark job
        over the union of dirty partitions — merge windows are keyed on
        the partition prefix, so each partition still merges locally
        within the shared shuffle)."""
        if not self.exists():
            return False
        # hold the write lock across read→canonicalize→swap: a threaded
        # append stamps its updated: tag BEFORE acquiring the lock, so
        # capturing `now` here (before the scan) guarantees any append
        # racing this merge compares updated > optimized and the
        # partition stays dirty for the next merge
        with self._write_lock:
            now = datetime.now(timezone.utc)
            dirty = self.dirty_partitions()
            if force:
                dirty = [
                    (r["shard"], r["bucket"], r["origin"])
                    for r in self.raw().select(*PARTITION_COLUMNS).distinct().collect()
                ]
            if not dirty:
                return False
            cutoff = now - timedelta(days=grace_days)
            raw = self.raw()
            # disjunction of per-partition conjunctions — unlike a
            # concat-key isin, this shape survives Catalyst's partition
            # pruning, so the scan literally never opens clean partitions
            pred = None
            for s, b, o in dirty:
                clause = (
                    (F.col("shard") == s) & (F.col("bucket") == b) & (F.col("origin") == o)
                )
                pred = clause if pred is None else (pred | clause)
            canonical = canonicalize(raw.filter(pred), grace_cutoff=cutoff)
            self.overwrite_partitions(canonical, expected=dirty)
            for p in dirty:
                self.tags.touch(f"optimized:{'/'.join(p)}", now)
            self.tags.touch("last_optimized", now)
        return True

    def compact(self, max_files_per_partition: int = 8) -> list[tuple[str, str, str]]:
        """Bin-pack partitions that have accumulated too many small
        files (reference compact, storage/parquet.py:683-706 / Delta
        OPTIMIZE). Only offending partitions are read and rewritten —
        the same scoped-overwrite machinery the merge uses. Returns the
        partitions compacted."""
        if not self.exists():
            return []
        with self._write_lock:
            crowded: list[tuple[str, str, str]] = []
            data = self._data_path()
            for rel, n in self._fs.parquet_dirs(data).items():
                if n > max_files_per_partition:
                    parts = dict(p.split("=", 1) for p in rel.split("/") if "=" in p)
                    if len(parts) == len(PARTITION_COLUMNS):
                        crowded.append(tuple(parts[c] for c in PARTITION_COLUMNS))
            if not crowded:
                return []
            pred = None
            for s, b, o in crowded:
                clause = (
                    (F.col("shard") == s) & (F.col("bucket") == b) & (F.col("origin") == o)
                )
                pred = clause if pred is None else (pred | clause)
            self.overwrite_partitions(self.raw().filter(pred))
        return crowded

    def vacuum(self) -> list[str]:
        """Remove stage directories orphaned by a crash between the
        stage write and the swap (the swap deletes replaced data
        eagerly, so live data never needs retention — only these
        leftovers do). Holding the write lock guarantees no in-flight
        stage in THIS driver; like the merge itself, vacuum belongs to
        the single maintenance driver (cross-driver coordination is a
        table format's job — README). Returns directories removed."""
        removed = []
        with self._write_lock:
            for name in self._fs.listdir(self.path):
                if name.startswith("_stage-"):
                    self._fs.delete(self._fs.join(self.path, name))
                    removed.append(name)
        return removed

    def canonical_since(self, version: int) -> DataFrame:
        """Canonical state of every entity touched after commit
        ``version`` — the file-level twin of ``canonical_changed``:
        changed ids come from ``raw_since`` (O(new files)), then the
        merge stack runs over a changed-id-scoped view of raw rows."""
        changed = self.raw_since(version).select("entity_id").distinct()
        scoped = self.raw().join(F.broadcast(changed), "entity_id", "left_semi")
        return canonicalize(scoped)

    # --------------------------------------------------------- queries
    def count_entities(self) -> int:
        return self.live().select("entity_id").distinct().count()

    def stats(self) -> dict:
        """DatasetStats shape (reference storage/parquet.py:294-304):
        entity_count + per-schema facets, one aggregation pass."""
        rows = (
            self.live()
            .groupBy("schema")
            .agg(F.countDistinct("entity_id").alias("n"))
            .collect()
        )
        schemata = {r["schema"]: r["n"] for r in rows}
        return {
            "name": self.config.name,
            "entity_count": self.count_entities(),
            "things": {"schemata": schemata, "total": sum(schemata.values())},
        }

    def raw_since(self, version: int) -> DataFrame:
        """Physical rows written after commit ``version`` — the
        file-level incremental read behind the version cursor
        (reference diff.py:62-83 asks Delta the same question). New
        files from ``append`` commits are read DIRECTLY (no scan of
        the table); partitions touched by a ``rewrite`` (merge/
        compact) fall back to a partition-pruned scan, since the swap
        replaced their files wholesale. An incremental consumer
        therefore reads O(new data), not O(table)."""
        files, rewritten = self.commits.files_since(version)
        data = self._data_path()
        parts = []
        if files:
            # basePath recovers the hive partition columns from paths
            parts.append(
                self.spark.read.option("basePath", data)
                .schema(STATEMENT_SCHEMA)
                .parquet(*[self._fs.join(data, f) for f in files])
            )
        if rewritten:
            pred = None
            for s, b, o in sorted(rewritten):
                clause = (
                    (F.col("shard") == s) & (F.col("bucket") == b) & (F.col("origin") == o)
                )
                pred = clause if pred is None else (pred | clause)
            parts.append(self.raw().filter(pred))
        if not parts:
            return self.spark.createDataFrame([], STATEMENT_SCHEMA)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def changed_entity_ids(self, since: datetime) -> DataFrame:
        """Entities changed since ``since``: first observed or deleted
        after the cursor (reference I2, storage/parquet.py:766-805)."""
        raw = self.raw()
        return (
            raw.filter(
                (F.col("first_seen") >= F.lit(since))
                | (F.col("deleted_at") >= F.lit(since))
            )
            .select("entity_id")
            .distinct()
        )

    def canonical_changed(self, since: datetime) -> DataFrame:
        """Canonical state of changed entities WITHOUT requiring a merge
        first — the merge window stack applied as a view over raw rows,
        scoped by a changed-id semi-join (reference I3,
        logic/parquet.py:195-231; SURVEY §7.4 hard-part 6)."""
        changed = self.changed_entity_ids(since)
        scoped = self.raw().join(F.broadcast(changed), "entity_id", "left_semi")
        return canonicalize(scoped)
