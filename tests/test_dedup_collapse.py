"""Exact-duplicate pre-collapse equivalence (round 4): every blocked
dedup tier groups exact copies before its candidate join and expands
member pairs afterwards. These tests pin the expansion branches —
within-group pairs and cross-group member products — on a crafted
duplicate-heavy corpus (the driver's sf0.01 tables are duplicate-free,
so without this the expansion paths would only be covered by the
out-of-CI sf1 sweep)."""

import pytest
from pyspark.sql import functions as F


TEXT_A = "the quick brown fox jumps over the lazy dog again and again"
TEXT_B = "the quick brown fox jumps over the lazy cat again and again"
TEXT_C = "completely unrelated content about distributed query engines"


@pytest.fixture(scope="module")
def dup_docs(spark):
    # A appears 3x, B 2x, C 1x — near-dup pair (A, B) must expand to
    # all 3x2 member pairs; A's and B's copies must pair within-group
    rows = [
        (1, TEXT_A), (2, TEXT_A), (5, TEXT_A),
        (3, TEXT_B), (6, TEXT_B),
        (4, TEXT_C),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairs(df):
    return {(r["a"], r["b"]): r for r in df.collect()}


A_IDS, B_IDS = [1, 2, 5], [3, 6]
WITHIN_A = {(1, 2), (1, 5), (2, 5)}
WITHIN_B = {(3, 6)}
CROSS_AB = {(min(i, j), max(i, j)) for i in A_IDS for j in B_IDS}


def test_minhash_collapse_expands_all_member_pairs(dup_docs):
    from ftm_lakehouse_spark.operators.dedupe import minhash_lsh_pairs

    got = _pairs(minhash_lsh_pairs(dup_docs, jaccard_threshold=0.3))
    assert WITHIN_A | WITHIN_B <= set(got)
    assert CROSS_AB <= set(got)
    for p in WITHIN_A | WITHIN_B:
        assert got[p]["jaccard"] == 1.0
    # all copies of a cross pair carry the ONE computed jaccard
    js = {got[p]["jaccard"] for p in CROSS_AB}
    assert len(js) == 1 and 0.3 <= js.pop() < 1.0
    # C pairs with nothing
    assert not any(4 in p for p in got)


def test_simhash_collapse_expands_all_member_pairs(dup_docs):
    from ftm_lakehouse_spark.operators.dedupe import simhash_duplicates

    got = _pairs(simhash_duplicates(dup_docs, max_hamming=6))
    assert WITHIN_A | WITHIN_B <= set(got)
    for p in WITHIN_A | WITHIN_B:
        assert got[p]["hamming"] == 0
    hs = {got[p]["hamming"] for p in CROSS_AB if p in got}
    assert len(hs) <= 1  # one computed distance shared by every copy


def test_ngram_collapse_expands_all_member_pairs(dup_docs):
    from ftm_lakehouse_spark.operators.dedupe import ngram_jaccard_pairs

    got = _pairs(ngram_jaccard_pairs(dup_docs, threshold=0.3))
    assert WITHIN_A | WITHIN_B <= set(got)
    assert CROSS_AB <= set(got)  # same 4-token block, near-dup shingles
    for p in WITHIN_A | WITHIN_B:
        assert got[p]["jaccard"] == 1.0


@pytest.fixture(scope="module")
def dup_vectors(spark):
    va = [1.0, 0.0] + [0.0] * 62
    vb = [0.98, 0.199] + [0.0] * 62  # cosine(va, vb) ≈ 0.98
    vc = [0.0, 1.0] + [0.0] * 62
    rows = [(1, va), (2, va), (5, va), (3, vb), (6, vb), (4, vc)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def test_embedding_collapse_expands_all_member_pairs(dup_vectors):
    from ftm_lakehouse_spark.operators.dedupe import embedding_near_dups

    got = _pairs(embedding_near_dups(dup_vectors, threshold=0.9))
    assert WITHIN_A | WITHIN_B <= set(got)
    for p in WITHIN_A | WITHIN_B:
        assert got[p]["cosine"] == 1.0
    cs = {got[p]["cosine"] for p in CROSS_AB if p in got}
    assert len(cs) <= 1
    assert not any(4 in p for p in got)


def test_semantic_collapse_expands_all_member_pairs(dup_vectors):
    import numpy as np

    from ftm_lakehouse_spark.operators.dedupe import semantic_dedup_pairs

    cents = np.array([[1.0, 0.0] + [0.0] * 62, [0.0, 1.0] + [0.0] * 62])
    got = _pairs(semantic_dedup_pairs(dup_vectors, cents, threshold=0.9))
    assert WITHIN_A | WITHIN_B <= set(got)
    assert CROSS_AB <= set(got)  # va/vb share the first cell
    for p in WITHIN_A | WITHIN_B:
        assert got[p]["cosine"] == 1.0
    assert not any(4 in p for p in got)
