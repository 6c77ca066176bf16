"""The driver's correctness window grades only the FIRST 50 entries of
query_map() — pin that the window is curated: capstones present, every
graded slot full-oracle, rows-only checks excluded (round-2 VERDICT
top-next item), and the round-7 evidence-rotation actually rotated
never-driver-graded gates in (round-6 VERDICT item 1)."""

from ftm_lakehouse_spark.queries.inventory import (
    GRADE_ORDER,
    QUERIES,
    oracle_map,
    query_map,
)

#: the round-7 anchors: active capstones + one per family. Veterans
#: that ceded their slots in the rotation (q1, the chunk-pack and
#: curation pipelines, sim_ivfpq_topk, x_kmv_distinct, ...) stay
#: parity-verified outside the window every round.
CAPSTONES = {
    "pipeline_pretrain_corpus",
    "pipeline_ftm_e2e",
    "pipeline_streaming_ingest",
    "pipeline_zorder_scan",
    "q5_local_supplier_volume",
    "dedup_winnow_substrings",
    "sample_pack_sequences",
    "graph_parent_chain",
    "graph_pagerank",
    "sim_knn_blocked",
    "c_pack_codec",
}

#: round-7 rotation: gates that had NEVER occupied a driver-graded
#: slot in rounds 1-6 (x_approx_stats had, but only as a rows-only
#: check; its full-oracle form is likewise new evidence). The VERDICT
#: bar was >= 15 — the window carries 20.
ROTATED_IN = {
    "w_range_frame",
    "w_percent_rank",
    "w_first_last_value",
    "w_lag_lead",
    "x_pivot_wide",
    "x_unpivot_long",
    "a_grouping_sets",
    "sim_ivf_topk",
    "sim_pq_adc_topk",
    "x_approx_stats",
    "x_countmin_sketch",
    "x_bloom_filter",
    "x_histogram",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    "j_full_outer_nations",
    "dedup_semantic",
    "sample_stratified",
    "text_benchmark_overlap",
    "mm_audio_roundtrip",
}


def test_grade_order_is_the_first_fifty():
    assert len(GRADE_ORDER) == 50
    assert len(set(GRADE_ORDER)) == 50
    missing = [n for n in GRADE_ORDER if n not in QUERIES]
    assert not missing, f"GRADE_ORDER names unknown queries: {missing}"
    assert list(query_map())[:50] == GRADE_ORDER


def test_graded_window_carries_maximum_evidence():
    window = set(GRADE_ORDER)
    assert CAPSTONES <= window
    assert len(ROTATED_IN) == 20 and ROTATED_IN <= window
    # every graded slot has a full value-hash oracle — no rows-only
    # checks burning a slot
    oracles = oracle_map()
    no_oracle = [n for n in GRADE_ORDER if n not in oracles]
    assert not no_oracle, f"graded slots without oracle: {no_oracle}"


def test_nothing_lost_in_reorder():
    # the reorder is a permutation: every registered query still
    # appears exactly once, oracles unchanged
    assert sorted(query_map()) == sorted(QUERIES)
    assert set(oracle_map()) == {n for n, (_, s) in QUERIES.items() if s is not None}
