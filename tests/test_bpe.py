"""Distributed BPE training vs an independent pure-Python reference
implementation (textbook Sennrich algorithm) — merge tables must be
IDENTICAL, including tie-breaks."""

import pytest
import re
from collections import Counter

from ftm_lakehouse_spark.operators.bpe import bpe_segment_words, bpe_train

_TOKEN = re.compile(r"[a-z0-9]+")


def _reference_bpe(texts, num_merges, min_pair_count=2):
    """Driver-side BPE: same tokenization (lowercase alnum runs), same
    </w> convention, same (count desc, left, right) tie-break."""
    words = Counter()
    for t in texts:
        words.update(_TOKEN.findall(t.lower()))
    vocab = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for rank in range(num_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, a + b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


TEXTS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest wider wide",
    "the quick brown fox the quick brown fox the slow brown fox",
]


def test_bpe_matches_reference_implementation(spark):
    docs = spark.createDataFrame(list(enumerate(TEXTS)), ["doc_id", "text"])
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, num_merges=12).orderBy("rank").collect()
    ]
    assert got == _reference_bpe(TEXTS, 12)
    assert len(got) == 12


@pytest.mark.slow
def test_bpe_segmentation_applies_learned_merges(spark):
    docs = spark.createDataFrame(list(enumerate(TEXTS)), ["doc_id", "text"])
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, num_merges=12).orderBy("rank").collect()
    ]
    seg = bpe_segment_words(
        spark.createDataFrame([("lowest",), ("brown",)], ["word"]), merges
    )
    pieces = {r["word"]: r["pieces"] for r in seg.collect()}
    # every piece chain reconstructs the word + </w>
    for w, ps in pieces.items():
        assert "".join(ps) == w + "</w>"
    # learned structure transfers to the unseen word "lowest"
    assert pieces["lowest"][0] == "low"


def test_bpe_min_count_stops_early(spark):
    docs = spark.createDataFrame([(1, "ab ab cd")], ["doc_id", "text"])
    m = bpe_train(docs, num_merges=50, min_pair_count=3).collect()
    assert len(m) == 0 or all(r["pair_count"] >= 3 for r in m)


def _reference_encode_counts(texts, merges):
    """Driver-side encode: apply merges in rank order per word, count
    pieces per document — the oracle for the distributed encode path
    (segment DISTINCT words, join counts back)."""
    out = []
    for doc_id, t in enumerate(texts):
        toks = _TOKEN.findall(t.lower())
        n_tokens = 0
        for w in toks:
            syms = list(w) + ["</w>"]
            for _, a, b, _, _ in merges:
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            n_tokens += len(syms)
        out.append((doc_id, len(toks), n_tokens))
    return out


def test_bpe_encode_token_counts_match_reference(spark):
    """The full encode pipeline (train → segment distinct words → join
    back → per-doc totals) against the pure-Python replica — the same
    composition queries/inventory.text_bpe_encode grades vs DuckDB."""
    import pyspark.sql.functions as F

    from ftm_lakehouse_spark.functions.text import tokens

    docs = spark.createDataFrame(list(enumerate(TEXTS)), ["doc_id", "text"])
    merges_full = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, num_merges=12).orderBy("rank").collect()
    ]
    per_word = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    seg = bpe_segment_words(
        per_word.select("word").distinct(), [(a, b) for _, a, b, _, _ in merges_full]
    ).select("word", F.size("pieces").alias("n_pieces"))
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in per_word.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_pieces")).alias("n_tokens"),
        )
        .collect()
    }
    want = {d: (nw, nt) for d, nw, nt in _reference_encode_counts(TEXTS, merges_full)}
    assert got == want
    # encoding compresses: fewer pieces than characters, at least as
    # many pieces as words
    for d, (nw, nt) in got.items():
        assert nt >= nw
