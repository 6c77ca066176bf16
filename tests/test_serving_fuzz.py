"""Seeded randomized store-lifecycle fuzz for the serving path.

`test_serving.py` pins hand-built assembly cases and a randomized
mirror of the schema fold; `test_merge_fuzz_oracle.py` certifies the
merge against the reference SQL. This closes the remaining gap: whole
STORE LIFECYCLES — random multi-origin writes (including Hive-escaped
origin names), fragment re-emissions, deletes, merges at random
points — after which the Spark-free direct path must agree with the
Spark path on EVERY entity (present and missing), on batch gets, and
on a version pinned mid-history (time travel on both engines).
"""

import pytest
import json
import random

from ftm_lakehouse_spark.lakehouse import Lakehouse


def _canon(ent):
    return json.dumps(ent, default=str, sort_keys=True)


PROPS = ["name", "alias", "email", "country", "phone"]
SCHEMAS = ["Person", "Company", "LegalEntity", "Organization"]
ORIGINS = ["bulk", "crawl", "web:crawl-2024", "a=b%c", "ünïcode#1"]
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


@pytest.mark.slow
def test_store_lifecycle_fuzz_direct_vs_spark(spark, tmp_path):
    rng = random.Random(20260816)
    for case in range(6):
        ds = Lakehouse(spark, str(tmp_path / f"fuzz{case}")).dataset(
            f"fz{case}", shards=rng.choice([2, 4])
        )
        pinned_version = None
        for _wave in range(rng.randint(2, 4)):
            ds.write_entities(
                spark.createDataFrame(_random_wave(rng)),
                origin=rng.choice(ORIGINS),
            )
            if rng.random() < 0.4:
                ds.delete_entity(rng.choice(IDS))
            if rng.random() < 0.4:
                ds.merge(force=True)
            if pinned_version is None and rng.random() < 0.5:
                pinned_version = ds.store.commits.current_version()

        probe = IDS + ["missing-one"]
        # head: every entity identical across engines, single and batch
        direct_batch = ds.get_many(probe, engine="direct")
        spark_batch = ds.get_many(probe, engine="spark")
        for eid in probe:
            assert _canon(direct_batch[eid]) == _canon(spark_batch[eid]), (
                f"case {case} head batch diverged on {eid}"
            )
            assert _canon(ds.get(eid, engine="direct")) == _canon(
                spark_batch[eid]
            ), f"case {case} single get diverged on {eid}"
        # pinned mid-history version: time travel agrees
        if pinned_version:
            for eid in probe:
                d = ds.get(eid, engine="direct", as_of=pinned_version)
                s = ds.get(eid, engine="spark", as_of=pinned_version)
                assert _canon(d) == _canon(s), (
                    f"case {case} as_of={pinned_version} diverged on {eid}"
                )
