#!/bin/bash
# Round-8 second sweep: sf100 rows for the 19 gates the saturation
# rotation put into the graded window that never ran above sf0.1
# (the window's whole never-graded tail minus text_bpe_merges, which
# already has its sf100 row from round 7). Same three-leg pattern as
# tools/sweep_r8.sh:
#   A. full oracle parity AT sf100 for small-output gates
#   B. full oracle parity at sf10 (or sf1 for x_feature_snapshot,
#      whose output is ~1.5k rows per replica -> 15M at sf10 exceeds
#      the pandas comparator) for big-output gates
#   C. engine wall time at sf100 for the leg-B gates
# Run SOLO on the box; clean /tmp spark scratch between legs.
set -u
cd /root/repo
export SPARK_GRAFT_CONF="spark.sql.shuffle.partitions=256;spark.io.compression.codec=zstd;spark.rdd.compress=true"

SMALL="a_median_groups a_skew_salted sim_centroid_stats sim_kmeans_update \
text_bigram_topk text_length_buckets x_cohort_retention x_correlation \
x_string_agg dedup_chunks sample_interleave_sources"
BIG="doc_chunk_overlap sim_quantize_int8 text_novelty_score text_pii_scrub \
text_repetition_ratio text_repetition_stats"
HUGE="x_feature_snapshot"

echo "=== leg A: sf100 full oracle parity (small-output gates)"
python tools/check_parity.py /tmp/sf100 $SMALL 2>&1 | grep -E "^(OK|FAIL|[0-9]+/)" | tail -14
rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null

echo "=== leg B: sf10 full oracle parity (big-output gates)"
python tools/check_parity.py /tmp/sf10 $BIG 2>&1 | grep -E "^(OK|FAIL|[0-9]+/)" | tail -8
echo "=== leg B': sf1 full oracle parity (x_feature_snapshot)"
python tools/check_parity.py /tmp/sf1 $HUGE 2>&1 | grep -E "^(OK|FAIL|[0-9]+/)" | tail -3
rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null

echo "=== leg C: sf100 engine walls (big-output gates)"
python tools/run_gates.py /tmp/sf100 $BIG $HUGE 2>&1 | grep -vE "Stage|WARN|INFO" | tail -10
rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
echo "=== sweep done"
