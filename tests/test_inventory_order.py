"""The driver's correctness window grades only the FIRST 50 entries of
query_map() — pin that the window is curated: capstones present, every
graded slot full-oracle, rows-only checks excluded (round-2 VERDICT
top-next item), and the round-8 evidence-rotation actually rotated
never-driver-graded gates in (round-7 VERDICT item 2; SATURATION
pass — all 39 never-graded gates take the window at once, cumulative
driver-graded coverage 93/132 -> 132/132 this round)."""

from ftm_lakehouse_spark.queries.inventory import (
    GRADE_ORDER,
    QUERIES,
    oracle_map,
    query_map,
)

#: the stable anchors: active capstones + one per family. Veterans
#: that ceded their slots in the rotations (q1, the chunk-pack and
#: curation pipelines, sim_ivfpq_topk, x_kmv_distinct, the round-7
#: frame/pivot/sketch slots, ...) stay parity-verified outside the
#: window every round.
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

#: round-8 rotation: gates that had NEVER occupied a driver-graded
#: slot in rounds 1-7 (computed from all CORRECTNESS_r01..r07 JSON
#: artifacts). The VERDICT bar was >= 20 — the window carries ALL 39,
#: saturating cumulative driver-graded coverage at 132/132 this round
#: instead of leaving 19 for a round-9 pass.
ROTATED_IN = {
    "w_tumbling_window",
    "w_hopping_window",
    "w_session_window",
    "w_moving_avg",
    "w_ntile_quartiles",
    "q3_shipping_priority",
    "q10_returned_items",
    "q22_global_sales_opportunity",
    "text_bm25_topk",
    "text_tfidf_top_terms",
    "text_decontaminate",
    "text_unigram_logprob",
    "text_dup_ngram_coverage",
    "text_bigram_topk",
    "text_bpe_merges",
    "text_length_buckets",
    "text_novelty_score",
    "text_pii_scrub",
    "text_repetition_ratio",
    "text_repetition_stats",
    "sample_dsir_weights",
    "sample_epoch_shuffle",
    "sample_hash_based",
    "split_train_val_test",
    "sample_interleave_sources",
    "a_median_groups",
    "a_skew_salted",
    "dedup_chunks",
    "doc_chunk_overlap",
    "sim_centroid_stats",
    "sim_kmeans_update",
    "sim_quantize_int8",
    "x_json_extract",
    "x_funnel_stages",
    "x_cohort_retention",
    "x_correlation",
    "x_feature_snapshot",
    "x_string_agg",
    "mm_video_frame_sample",
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
    assert len(ROTATED_IN) == 39 and ROTATED_IN <= window
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


def test_rotated_in_were_never_driver_graded():
    """The rotation's whole point: each ROTATED_IN gate must have NO
    row in any PRIOR round's CORRECTNESS artifact (rounds 1-7 — the
    set is defined relative to those; they were parity/pytest-verified
    only until now). r08+ artifacts are exactly where these gates DO
    earn rows, so they are excluded."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    graded: set[str] = set()
    for rnd in range(1, 8):
        f = os.path.join(root, f"CORRECTNESS_r{rnd:02d}.json")
        if os.path.exists(f):
            graded |= set(json.load(open(f)).keys())
    if not graded:  # fresh checkout without driver artifacts
        return
    overlap = ROTATED_IN & graded
    assert not overlap, f"already driver-graded: {sorted(overlap)}"
