"""Stream-stream joins with bounded state.

The canonical attribution shape: match each conversion to the click
that preceded it within an event-time horizon, both sides unbounded
streams. Correct-and-bounded requires two things Spark enforces
together (SPARK docs, Structured Streaming §stream-stream joins):

  * **watermarks on both sides** — late rows beyond the watermark are
    dropped instead of waiting forever;
  * **an event-time range in the join condition** — gives the state
    store an eviction bound: a click older than ``horizon`` past the
    watermark can never match a future purchase, so its state is
    reclaimed. Without the range bound the join would buffer both
    streams indefinitely.

State size is O(rows within watermark+horizon), independent of stream
length — the property that keeps a 100 TB/day event feed joinable on a
fixed-size cluster.

Outer-join operational notes (pinned by test_streaming_joins):
  * the global watermark is the MIN across all watermarked inputs
    (``spark.sql.streaming.multipleWatermarkPolicy`` default) — an
    idle side holds back eviction AND outer-NULL emission for both;
  * the max-event-time tracker behind the watermark is in-memory
    only: an ``availableNow`` restart replans from the checkpointed
    watermark, so unmatched rows only flush in later batches of the
    SAME run (or after new data in the next run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event-time streams on ``key`` where the right event
    falls in ``[left.ts, left.ts + horizon]``.

    Works identically on batch DataFrames (watermark is a no-op there),
    so the same code path serves backfill and live attribution — the
    batch face is what the oracle gate grades.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND r.{ts_col} >= l.{ts_col} "
        f"AND r.{ts_col} <= l.{ts_col} + INTERVAL {horizon}"
    )
    return l.join(r, cond, how)
