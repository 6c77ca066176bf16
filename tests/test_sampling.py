"""Deterministic-sampling operators: stratified top-k-by-hash and
temperature-scaled mixing, plus chunk-level dedup."""

import pytest
from pyspark.sql import functions as F

from ftm_lakehouse_spark.operators.sampling import (
    hash_uniform,
    stratified_sample,
    temperature_mix,
)


@pytest.fixture(scope="module")
def docs(spark):
    # skewed strata: 40 'en', 10 'fr', 5 'de'
    rows = [(i, "en" if i < 40 else ("fr" if i < 50 else "de")) for i in range(55)]
    return spark.createDataFrame(rows, ["doc_id", "lang"])


def test_stratified_sample_caps_every_stratum(docs):
    out = stratified_sample(docs, "lang", 8).groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in out}
    assert got == {"en": 8, "fr": 8, "de": 5}  # de has only 5 rows


def test_stratified_sample_is_rerun_stable(docs):
    a = sorted(r["doc_id"] for r in stratified_sample(docs, "lang", 8).collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(7), "lang", 8).collect()
    )
    assert a == b


def test_stratified_sample_membership_survives_appends(docs, spark):
    """Adding new rows must not evict previously sampled rows unless the
    new row hashes below them — membership is id-determined."""
    base = set(
        r["doc_id"]
        for r in stratified_sample(docs.filter(F.col("lang") == "de"), "lang", 3).collect()
    )
    more = docs.union(spark.createDataFrame([(999, "de")], ["doc_id", "lang"]))
    after = set(
        r["doc_id"]
        for r in stratified_sample(more.filter(F.col("lang") == "de"), "lang", 3).collect()
    )
    # at most one member displaced, and only by the new id
    assert len(after - base) <= 1
    assert after - base <= {999}


def test_temperature_mix_downsamples_majority_only(docs):
    out = temperature_mix(docs, "lang", alpha=0.7)
    rates = {
        r["lang"]: r["keep_rate"]
        for r in out.select("lang", "keep_rate").distinct().collect()
    }
    # smallest stratum (de, 5 rows) keeps rate 1.0; en (40) is scaled
    assert rates["de"] == 1.0
    assert 0 < rates["en"] == round((5 / 40) ** 0.3, 6) < 1
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts["de"] == 5
    assert counts["en"] < 40


def test_temperature_mix_alpha_one_keeps_everything(docs):
    assert temperature_mix(docs, "lang", alpha=1.0).count() == docs.count()


def test_hash_uniform_range_and_determinism(spark):
    df = spark.range(2000).select(hash_uniform(F.col("id"), "s:").alias("u"))
    agg = df.agg(F.min("u"), F.max("u"), F.count_distinct("u")).first()
    assert 0 <= agg[0] and agg[1] < 16**6
    assert agg[2] > 1990  # essentially collision-free at this n


def test_duplicate_chunks_finds_repeated_passage(spark):
    from ftm_lakehouse_spark.operators.dedupe import duplicate_chunks

    passage = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, passage + " " + " ".join(f"x{i}" for i in range(20))),
        (2, passage + " " + " ".join(f"y{i}" for i in range(20))),
        (3, " ".join(f"z{i}" for i in range(40))),
        (4, "short text below one chunk"),
    ]
    out = duplicate_chunks(
        spark.createDataFrame(rows, ["doc_id", "text"]), chunk_words=20
    ).collect()
    assert len(out) == 1
    assert out[0]["n_occurrences"] == 2 and out[0]["n_docs"] == 2


def test_winnow_guarantees_long_overlap_detection(spark):
    """Winnowing property: a verbatim overlap of length >= k+window-1
    (31 chars here) MUST produce a shared fingerprint; unrelated docs
    with no 24-char common substring must not pair."""
    from ftm_lakehouse_spark.operators.dedupe import winnow_fingerprint_pairs

    shared = "the quick brown fox jumps over the lazy dog near the riverbank"
    docs = spark.createDataFrame(
        [
            (1, "AAA " * 30 + shared + " unique tail one two three"),
            (2, "totally different preamble here. " + shared + " BBB " * 30),
            (3, "no overlap with anything else at all, " + "xyz " * 60),
            (4, "another fully distinct document body, " + "qrs " * 60),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["a"], r["b"]): r["n_shared"]
        for r in winnow_fingerprint_pairs(docs, min_shared=1, max_doc_freq=4).collect()
    }
    assert (1, 2) in pairs  # the planted 63-char overlap is found
    assert all(p == (1, 2) for p in pairs)  # and nothing else pairs


def test_winnow_auto_guard_survives_replica_saturation(spark):
    """VERDICT r7 item 6: on a replica-heavy corpus the fixed
    max_doc_freq guard saturates (every fingerprint's doc frequency
    scales with the copy count) and the result goes empty BY DESIGN;
    max_doc_freq='auto' scales the threshold by the measured
    duplication (64 x ceil(docs/distinct_texts)) and keeps the planted
    overlap findable."""
    import pytest

    from ftm_lakehouse_spark.operators.dedupe import winnow_fingerprint_pairs

    shared = "the quick brown fox jumps over the lazy dog near the riverbank"
    base = [
        (1, "AAA " * 30 + shared + " unique tail one two three"),
        (2, "totally different preamble here. " + shared + " BBB " * 30),
        (3, "no overlap with anything else at all, " + "xyz " * 60),
    ]
    # 70 exact copies of each doc: the shared fingerprints' doc
    # frequency is >= 140 > 64, so the fixed default drops them all
    rows = [
        (doc_id * 1000 + rep, text)
        for doc_id, text in base
        for rep in range(70)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fixed = winnow_fingerprint_pairs(docs, min_shared=1).count()
    assert fixed == 0  # saturation: correct but vacuous

    auto = winnow_fingerprint_pairs(docs, min_shared=1, max_doc_freq="auto")
    pairs = {(r["a"], r["b"]) for r in auto.collect()}
    # every cross-copy (1-family, 2-family) pair carries the overlap
    assert (1000, 2000) in pairs
    assert not any(a // 1000 == 3 or b // 1000 == 3 for a, b in pairs
                   if a // 1000 != b // 1000)

    # duplication ~= 1 -> auto is IDENTICAL to the fixed default
    uniq = spark.createDataFrame(base, ["doc_id", "text"])
    got_auto = sorted(
        (r["a"], r["b"], r["n_shared"])
        for r in winnow_fingerprint_pairs(uniq, min_shared=1,
                                          max_doc_freq="auto").collect()
    )
    got_fixed = sorted(
        (r["a"], r["b"], r["n_shared"])
        for r in winnow_fingerprint_pairs(uniq, min_shared=1).collect()
    )
    assert got_auto == got_fixed

    with pytest.raises(ValueError, match="auto"):
        winnow_fingerprint_pairs(uniq, max_doc_freq="bogus")
