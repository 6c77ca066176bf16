"""Seeded store-lifecycle fuzz for the serving path OVER S3 (round 11,
VERDICT r10 item 3).

`test_serving_fuzz.py` races append/merge/vacuum against direct gets on
local disk; the S3 plane had parity + GET-count tests but not the
lifecycle fuzz. This runs the same randomized lifecycle with the store
MIRRORED to a moto S3 endpoint after every mutation, while ONE
PointReader survives the whole lifecycle — so its footer cache and
version-keyed shard index go stale against rewrites and vacuums exactly
the way a long-lived serving process's would, on the path where stale
reads actually differ (ranged GETs on immutable keys + paginated
listings):

* after every wave, the S3 direct path must agree with the local Spark
  path on every entity (present and missing), single and batch;
* a version pinned mid-history stays readable over S3 (time travel)
  until vacuum reclaims it;
* after a rewrite + ``vacuum(retention=0)``, a pinned ``get_many`` over
  S3 hits the vacuumed keys and must surface the typed
  :class:`LogTruncated` (the 410 contract), NOT a raw
  FileNotFoundError — while HEAD reads stay correct through the same
  reader and its warm caches.

The data plane is local-staged (Spark writes local parquet, the mirror
uploads the immutable files) because this image has no s3a jars; the
serving reads, commit-log listings and vacuum-visible deletions all
travel the real S3 wire protocol via moto.
"""

import json
import os
import random

import pytest

pytest.importorskip("moto")
pytest.importorskip("boto3")

from ftm_lakehouse_spark.lakehouse import Lakehouse

# moto server + env wiring (module gets its own instance)
from tests.test_object_store_serving import s3env  # noqa: F401


def _canon(ent):
    return json.dumps(ent, default=str, sort_keys=True)


PROPS = ["name", "alias", "email", "country", "phone"]
SCHEMAS = ["Person", "Company", "LegalEntity", "Organization"]
ORIGINS = ["bulk", "crawl", "web:crawl-2024", "a=b%c"]
IDS = [f"e{i}" for i in range(6)]


def _random_wave(rng: random.Random) -> list[dict]:
    rows = []
    for _ in range(rng.randint(1, 5)):
        props = {
            rng.choice(PROPS): [f"v{rng.randint(0, 3)}"
                                for _ in range(rng.randint(1, 2))]
            for _ in range(rng.randint(1, 3))
        }
        rows.append({
            "id": rng.choice(IDS),
            "schema": rng.choice(SCHEMAS),
            "properties": props,
        })
    return rows


class _Mirror:
    """Incremental local→S3 mirror of a store directory: data files are
    immutable (upload once, delete when reaped), ``_meta/`` control
    files are re-uploaded every sync (tags/commit log advance)."""

    def __init__(self, local_root: str, bucket: str, prefix: str):
        from ftm_lakehouse_spark.sources.object_store import S3FS

        self.local_root = local_root
        self.bucket, self.prefix = bucket, prefix
        self.s3 = S3FS()._s3
        self.state: set[str] = set()

    def sync(self) -> None:
        current: dict[str, str] = {}
        for r, _dirs, files in os.walk(self.local_root):
            for f in files:
                full = os.path.join(r, f)
                rel = os.path.relpath(full, self.local_root).replace(os.sep, "/")
                current[rel] = full
        for rel, full in sorted(current.items()):
            if rel not in self.state or rel.startswith("_meta/"):
                with open(full, "rb") as fh:
                    self.s3.put_object(
                        Bucket=self.bucket, Key=f"{self.prefix}/{rel}",
                        Body=fh.read(),
                    )
        for rel in sorted(self.state - set(current)):
            self.s3.delete_object(
                Bucket=self.bucket, Key=f"{self.prefix}/{rel}"
            )
        self.state = set(current)


@pytest.mark.slow
def test_s3_store_lifecycle_fuzz(s3env, spark, tmp_path):
    from ftm_lakehouse_spark.serving import PointReader
    from ftm_lakehouse_spark.sources.commits import LogTruncated
    from ftm_lakehouse_spark.sources.statement_store import StatementStore

    rng = random.Random(20260817)
    probe = IDS + ["missing-one"]
    for case in range(3):
        ds = Lakehouse(spark, str(tmp_path / f"s3fuzz{case}")).dataset(
            f"fz{case}", shards=rng.choice([2, 4])
        )
        mirror = _Mirror(
            str(ds.store.path), "lake", f"tables/s3fuzz{case}"
        )

        # wave 1 + pin: the pinned snapshot is the LogTruncated target
        wave1 = _random_wave(rng)
        ds.write_entities(spark.createDataFrame(wave1), origin="bulk")
        pinned = ds.store.commits.current_version()
        mirror.sync()
        s3store = StatementStore(
            spark, f"s3://lake/tables/s3fuzz{case}", ds.config
        )
        assert not s3store._adopting
        reader = PointReader(s3store)  # ONE reader for the whole lifecycle

        for _wave in range(rng.randint(2, 3)):
            ds.write_entities(
                spark.createDataFrame(_random_wave(rng)),
                origin=rng.choice(ORIGINS),
            )
            if rng.random() < 0.4:
                ds.delete_entity(rng.choice(IDS))
            if rng.random() < 0.5:
                ds.merge(force=True)
            mirror.sync()
            # head parity: stale shard index re-resolves at the new
            # commit head; footer cache keeps only immutable entries
            batch = reader.get_many(probe)
            spark_batch = ds.get_many(probe, engine="spark")
            for eid in probe:
                assert _canon(batch[eid]) == _canon(spark_batch[eid]), (
                    f"case {case} head diverged on {eid}"
                )
                assert _canon(reader.get(eid)) == _canon(spark_batch[eid])
            # pinned snapshot still readable over S3 (retention default)
            got = reader.get_many(probe, as_of=pinned)
            want = ds.get_many(probe, engine="spark", as_of=pinned)
            for eid in probe:
                assert _canon(got[eid]) == _canon(want[eid]), (
                    f"case {case} as_of={pinned} diverged on {eid}"
                )

        # epilogue: force a rewrite that retires the pinned snapshot's
        # files, then vacuum them away — the pinned batch get over S3
        # must surface the typed 410, head reads must keep working
        # through the same reader and its warm footer cache
        ds.write_entities(
            spark.createDataFrame(_random_wave(rng)), origin="bulk"
        )
        ds.merge(force=True)
        ds.store.vacuum(retention_hours=0.0)
        mirror.sync()
        with pytest.raises(LogTruncated):
            reader.get_many(probe, as_of=pinned)
        # single get: an id WRITTEN in wave 1 lives in a pinned-snapshot
        # file that the epilogue merge retired and vacuum removed, so
        # its footer min/max cannot prune the read away — the missing
        # key must surface as the typed 410 here too
        wave1_id = sorted({r["id"] for r in wave1})[0]
        with pytest.raises(LogTruncated):
            reader.get(wave1_id, as_of=pinned)
        batch = reader.get_many(probe)
        spark_batch = ds.get_many(probe, engine="spark")
        for eid in probe:
            assert _canon(batch[eid]) == _canon(spark_batch[eid]), (
                f"case {case} post-vacuum head diverged on {eid}"
            )
