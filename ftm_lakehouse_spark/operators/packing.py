"""Sequence packing: map a document corpus onto fixed-length training
sequences (the GPT-style pretraining step: concatenate all tokens in a
deterministic document order, cut every ``seq_len`` tokens, remember
which sequences each document spans).

The core is a GLOBAL running sum of token counts — the textbook way
(one window over a global ORDER BY) collapses onto a single reducer:
``Window.orderBy(...)`` without partitions plans a SinglePartition
Exchange, the classic 100 TB scale-killer. This operator uses the
two-phase cumsum instead:

  1. ``repartitionByRange(order_col)`` — a range shuffle (parallel,
     AQE-coalesced), which makes partition ids ordered by the key;
  2. per-partition cumsum — a window PARTITIONED BY the physical
     partition id, so every partition computes in parallel;
  3. per-partition totals (one tiny aggregate, #partitions rows)
     broadcast back and prefix-summed into per-partition offsets.

Total: one range shuffle + one broadcast of #partitions rows. The
plan is pinned by test_plans (no SinglePartition window exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from ftm_lakehouse_spark.persist import DATA_SIZED as _DATA_LEVEL
from pyspark.sql import functions as F

__all__ = ["global_cumsum", "pack_sequences"]


def global_cumsum(
    df: DataFrame, value_col: str, order_col: str, out: str = "cumsum"
) -> DataFrame:
    """``out`` = exclusive running sum of ``value_col`` in global
    ``order_col`` order, without a single-reducer global window."""
    ranged = df.repartitionByRange(F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_run = Window.partitionBy("_pid").orderBy(order_col)
    w_all = Window.partitionBy("_pid")
    # running AND per-partition total in ONE window node (same
    # partitioning → one shuffle); lineage cut so the offsets branch
    # doesn't rescan the corpus (at cluster scale: checkpoint())
    local = ranged.select(
        "*",
        (F.sum(value_col).over(w_run) - F.col(value_col)).alias("_local"),
        F.sum(value_col).over(w_all).alias("_ptotal"),
    ).localCheckpoint(storageLevel=_DATA_LEVEL)
    # one row per partition — prefix-summed into broadcast offsets
    # (the SinglePartition window below is over #partitions rows,
    # bounded by construction)
    offsets = (
        local.select("_pid", "_ptotal")
        .distinct()
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_ptotal").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, (F.col("_local") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local", "_ptotal", "_offset")
    )


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    seq_len: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each document its span of fixed-length training
    sequences: ``start_offset`` (global token position), ``first_seq``
    / ``last_seq`` (sequence ids it lands in, documents may straddle a
    boundary and be split, as in GPT-style packing), ``n_seqs``.

    Deterministic in ``order_col`` order — rerunning on the same
    corpus yields byte-identical packing (resumable preprocessing)."""
    cum = global_cumsum(df, tokens_col, order_col, out="start_offset")
    n = F.col(tokens_col).cast("long")
    # integer division end to end — no double rounding at offsets
    # beyond 2^53 (a 100 TB corpus is ~1e14 tokens)
    first = F.expr(f"start_offset div {seq_len}")
    last_pos = F.col("start_offset") + F.greatest(n, F.lit(1)) - 1
    return cum.select(
        order_col,
        n.alias("n_tokens"),
        "start_offset",
        first.alias("first_seq"),
        last_pos.alias("_lp"),
    ).select(
        order_col,
        "n_tokens",
        "start_offset",
        "first_seq",
        F.expr(f"_lp div {seq_len}").alias("last_seq"),
        (F.expr(f"_lp div {seq_len}") - F.col("first_seq") + 1).alias("n_seqs"),
    )
