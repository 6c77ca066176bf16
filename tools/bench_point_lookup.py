"""Measure warm point-lookup (``Dataset.get``) latency on a merged,
z-order-clustered store (round-6 VERDICT item 8): the number behind
SCALE.md §7's "serving cache outside the engine" recommendation.

Builds a store from the sf-dir's documents table (one entity per doc,
a few properties), merges, z-orders on (entity_id), then measures
``get()`` wall time — one cold call, then N warm calls on distinct
ids (median + p95 reported). The measured floor is Spark job
scheduling + plan analysis, not IO: the executed plan reads one shard
directory with entity_id row-group skipping (test_point_lookup pins
that), so at any corpus size the latency stays where this measures it
— which is exactly why a 100 TB deployment fronts `get()` with a
serving cache instead of asking Spark for sub-ms lookups.

Usage: python tools/bench_point_lookup.py [sf_dir] [n_warm]
"""

from __future__ import annotations

import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ftm_lakehouse_spark.lakehouse import Lakehouse
from ftm_lakehouse_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = get_spark("bench-point-lookup")
    root = tempfile.mkdtemp(prefix="pl_bench_")
    ds = Lakehouse(spark, root).dataset("plbench", shards=32)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ents = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("id"),
        F.lit("Document").alias("schema"),
        F.create_map(
            F.lit("title"), F.array(F.substring(F.col("text"), 1, 40)),
            F.lit("language"), F.array(F.col("lang").cast("string")),
        ).alias("properties"),
    )
    n = ents.count()
    ds.write_entities(ents, origin="bulk")
    ds.optimize(force=True, zorder=("entity_id",))

    ids = [f"doc-{i * (n // (n_warm + 1) or 1)}" for i in range(1, n_warm + 1)]

    t0 = time.perf_counter()
    assert ds.get("doc-1") is not None
    cold = time.perf_counter() - t0

    samples = []
    for eid in ids:
        t0 = time.perf_counter()
        ent = ds.get(eid)
        samples.append(time.perf_counter() - t0)
        assert ent is not None, eid
    samples.sort()
    print(
        f"point lookup on merged+zordered store ({n} entities, 32 shards): "
        f"cold {cold * 1000:.0f}ms, warm median "
        f"{statistics.median(samples) * 1000:.0f}ms, p95 "
        f"{samples[int(0.95 * len(samples))] * 1000:.0f}ms over {n_warm} gets"
    )


if __name__ == "__main__":
    main()
