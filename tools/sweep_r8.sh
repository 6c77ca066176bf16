#!/bin/bash
# Round-8 decade sweep: sf100 rows for the families that never ran
# above sf10 (VERDICT r7 item 3). Three legs:
#   A. full oracle parity at sf100 for the small-output gates
#   B. full oracle parity at sf10 for the big-output gates
#   C. engine wall time at sf100 for the big-output gates
# Run SOLO on the box; clean /tmp spark scratch between legs.
set -u
cd /root/repo
export SPARK_GRAFT_CONF="spark.sql.shuffle.partitions=256;spark.io.compression.codec=zstd;spark.rdd.compress=true"

SMALL="q3_shipping_priority q10_returned_items q22_global_sales_opportunity \
text_bm25_topk sample_dsir_weights w_ntile_quartiles x_funnel_stages \
x_json_extract text_decontaminate text_unigram_logprob split_train_val_test \
sample_hash_based"
BIG="text_tfidf_top_terms sample_epoch_shuffle w_tumbling_window \
w_session_window w_moving_avg"

echo "=== leg A: sf100 full oracle parity (small-output gates)"
python tools/check_parity.py /tmp/sf100 $SMALL 2>&1 | grep -E "^(OK|FAIL|[0-9]+/)" | tail -20
rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null

echo "=== leg B: sf10 full oracle parity (big-output gates)"
python tools/check_parity.py /tmp/sf10 $BIG 2>&1 | grep -E "^(OK|FAIL|[0-9]+/)" | tail -8
rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null

echo "=== leg C: sf100 engine walls (big-output gates)"
python tools/run_gates.py /tmp/sf100 $BIG 2>&1 | grep -vE "Stage|WARN|INFO" | tail -8
rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
echo "=== sweep done"
