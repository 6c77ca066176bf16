"""The driver's correctness window grades only the FIRST 50 entries of
query_map() — pin that the window is curated: capstones present, every
graded slot full-oracle, rows-only checks excluded (round-2 VERDICT
top-next item)."""

from ftm_lakehouse_spark.queries.inventory import (
    GRADE_ORDER,
    QUERIES,
    oracle_map,
    query_map,
)

CAPSTONES = {
    "pipeline_pretrain_corpus",
    "pipeline_embedding_curation",
    "pipeline_chunk_pack",
    "q5_local_supplier_volume",
    # sim_ivfpq_topk composes the IVF probe join and the PQ ADC scorer,
    # so it carries the whole family's evidence in one slot; the
    # standalone sim_ivf_topk / sim_pq_adc_topk gates stay parity-run
    # outside the window (freed slots grade pagerank/KMV/outer-join).
    "sim_ivfpq_topk",
    "dedup_winnow_substrings",
    "sample_pack_sequences",
    "graph_parent_chain",
    "graph_pagerank",
    "x_kmv_distinct",
    "c_pack_codec",
    # the FtM core write path end-to-end: explode → append → merge →
    # assemble against a real throwaway store, one composed oracle
    "pipeline_ftm_e2e",
}


def test_grade_order_is_the_first_fifty():
    assert len(GRADE_ORDER) == 50
    assert len(set(GRADE_ORDER)) == 50
    missing = [n for n in GRADE_ORDER if n not in QUERIES]
    assert not missing, f"GRADE_ORDER names unknown queries: {missing}"
    assert list(query_map())[:50] == GRADE_ORDER


def test_graded_window_carries_maximum_evidence():
    window = GRADE_ORDER
    assert CAPSTONES <= set(window)
    # every graded slot has a full value-hash oracle — no rows-only
    # checks burning a slot
    oracles = oracle_map()
    no_oracle = [n for n in window if n not in oracles]
    assert not no_oracle, f"graded slots without oracle: {no_oracle}"


def test_nothing_lost_in_reorder():
    # the reorder is a permutation: every registered query still
    # appears exactly once, oracles unchanged
    assert sorted(query_map()) == sorted(QUERIES)
    assert set(oracle_map()) == {n for n, (_, s) in QUERIES.items() if s is not None}
