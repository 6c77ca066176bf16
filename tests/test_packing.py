"""Sequence packing / two-phase global cumsum."""

from pyspark.sql import functions as F

from ftm_lakehouse_spark.operators.packing import global_cumsum, pack_sequences


def test_global_cumsum_matches_serial(spark):
    # 5000 rows, shuffled values; exclusive cumsum in id order
    df = spark.range(5000).select(
        "id", (F.xxhash64("id") % 97 + 97).alias("v")
    )
    got = {r["id"]: r["c"] for r in global_cumsum(df, "v", "id", out="c").collect()}
    vals = {r["id"]: r["v"] for r in df.collect()}
    acc = 0
    for i in range(5000):
        assert got[i] == acc, i
        acc += vals[i]


def test_pack_sequences_straddle(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 30), (4, 0)], ["doc_id", "n"]
    )
    rows = {
        r["doc_id"]: r for r in pack_sequences(df, "n", 128, "doc_id").collect()
    }
    assert (rows[1]["first_seq"], rows[1]["last_seq"], rows[1]["n_seqs"]) == (0, 0, 1)
    # doc 2 spans tokens 100..299 → sequences 0, 1, 2
    assert (rows[2]["first_seq"], rows[2]["last_seq"], rows[2]["n_seqs"]) == (0, 2, 3)
    assert (rows[3]["first_seq"], rows[3]["last_seq"]) == (2, 2)
    # zero-token doc occupies its boundary position, spans 1 sequence
    assert rows[4]["n_seqs"] == 1 and rows[4]["start_offset"] == 330


def test_rerun_is_byte_identical(spark):
    df = spark.range(2000).select("id", (F.col("id") % 7 + 1).alias("v"))
    a = sorted(map(tuple, pack_sequences(df, "v", 64, "id").collect()))
    b = sorted(map(tuple, pack_sequences(df, "v", 64, "id").collect()))
    assert a == b
