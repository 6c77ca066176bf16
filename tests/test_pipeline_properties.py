"""Property-based invariants for the round-3 training-pipeline
operators — the guarantees a user relies on at any scale:

1. **Chunk coverage** — overlapping chunking covers every token; chunk
   count and boundaries follow the integer formula; consecutive chunks
   overlap by exactly W - S tokens (except a short final chunk).
2. **CMS never undercounts** — min-over-rows estimates are >= the true
   count for every key, at any d/w (the Cormode-Muthukrishnan
   one-sided error guarantee the gate relies on).
3. **Interleave is a permutation** — global positions are unique and
   contiguous from 0 when sources are balanced, and per-source order
   is stable under repartitioning.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "x1", "y2"]


def _chunks(words, W, S):
    """Reference chunker (pure python) mirroring doc_chunk_overlap."""
    n = len(words)
    n_chunks = 1 if n <= W else (n - W + S - 1) // S + 1
    return [words[i * S : i * S + W] for i in range(n_chunks)]


@given(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=200),
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=1, max_value=39),
)
def test_chunk_coverage_and_overlap(words, W, S):
    if S >= W:
        S = W - 1  # overlap requires stride < window
    chunks = _chunks(words, W, S)
    # every token position covered
    covered = set()
    for i, c in enumerate(chunks):
        assert len(c) <= W
        assert c == words[i * S : i * S + W]
        covered.update(range(i * S, i * S + len(c)))
    assert covered == set(range(len(words)))
    # fixed overlap between consecutive chunks (full chunks)
    for i in range(len(chunks) - 1):
        if len(chunks[i]) == W and i * S + W <= len(words):
            assert chunks[i][S:] == chunks[i + 1][: W - S]
    # no chunk is entirely contained in the previous one
    if len(chunks) > 1:
        assert all(len(c) > 0 for c in chunks)
        assert (len(chunks) - 1) * S < len(words)


@settings(suppress_health_check=[HealthCheck.too_slow], deadline=None)
@given(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=4, max_value=32),
)
def test_cms_never_undercounts(stream, d, w):
    import collections
    import hashlib

    sketch = collections.Counter()
    for term in stream:
        for i in range(d):
            h = int(hashlib.md5(f"cms{i}:{term}".encode()).hexdigest()[:8], 16) % w
            sketch[(i, h)] += 1
    true = collections.Counter(stream)
    for term, tc in true.items():
        est = min(
            sketch[
                (i, int(hashlib.md5(f"cms{i}:{term}".encode()).hexdigest()[:8], 16) % w)
            ]
            for i in range(d)
        )
        assert est >= tc  # one-sided error: overcount only


def test_interleave_positions_are_unique_and_stable(spark):
    from ftm_lakehouse_spark.queries.inventory import QUERIES

    fn = QUERIES["sample_interleave_sources"][0]
    out = fn(spark, "/root/testdata/sf0.001").collect()
    pos = [r["global_pos"] for r in out]
    assert len(pos) == len(set(pos))  # a permutation, no collisions
    # per-source ranks are 1..n_s contiguous
    import collections

    by_src = collections.defaultdict(list)
    for r in out:
        by_src[r["source"]].append(r["rank_in_source"])
    for ranks in by_src.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # balanced prefix: among the first n_sources positions, every source
    # appears at most once per round-robin round
    first = sorted(out, key=lambda r: r["global_pos"])[: len(by_src)]
    assert len({r["source"] for r in first}) == len(first)
