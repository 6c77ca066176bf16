"""Determinism under parallelism: a gate's RESULT must not depend on
the cluster shape. This is the 100 TB correctness property — the same
query on 3 shuffle partitions and on 32 must produce byte-identical
rows, or the operator is leaking partition-dependent state
(order-sensitive float sums, spark_partition_id misuse, per-partition
hash seeds). One representative per family that could plausibly leak:
float/decimal aggregation, window merges, LSH banding, two-phase
global rank/cumsum, iterative fixed-point, hashed-feature weighting,
salted k-minima, Arrow-batched multimodal."""

from __future__ import annotations

import pytest

from ftm_lakehouse_spark.queries.inventory import QUERIES

SF = "/root/testdata/sf0.001"

PROBES = [
    "q5_local_supplier_volume",
    "a_merge_dedupe_latest",
    "dedup_minhash_lsh",
    "sample_pack_sequences",
    "sample_epoch_shuffle",
    "graph_pagerank",
    "sample_dsir_weights",
    "x_kmv_distinct",
    "text_bm25_topk",
    "mm_image_roundtrip",
]


def _rows(spark, name: str):
    df = QUERIES[name][0](spark, SF)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", PROBES)
def test_result_is_invariant_to_shuffle_partition_count(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert narrow == wide and len(narrow) > 0
