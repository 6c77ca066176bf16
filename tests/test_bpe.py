"""Distributed BPE training vs an independent pure-Python reference
implementation (textbook Sennrich algorithm) — merge tables must be
IDENTICAL, including tie-breaks."""

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
