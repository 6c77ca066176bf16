"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). Two implementations:

* :func:`asof_join` — the **union trick**: tag both sides, union on
  (key, ts), and carry the most recent right-row payload forward with
  ``last(ignorenulls)`` over a (key)-partitioned ts-ordered window.
  ONE shuffle on the key (the window sort), no join at all — this is
  the 100 TB path: cost ≈ a sort-merge join's shuffle, with perfect
  skew behavior because there is no build side.

* :func:`asof_join_pandas` — per-key ``pd.merge_asof`` via
  ``applyInPandas`` (guide-recommended fallback shape), kept for parity
  testing and for tolerance variants the window form can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_pandas"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_payload: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Left rows + the payload of the latest right row with
    ``right.ts <= left.ts``, matched per ``on`` key.

    Right-side ties on (key, ts) resolve to the row last in the union
    sort order; callers needing a total order should include a
    tiebreak in ``ts`` ordering upstream (or dedupe the right side).
    """
    lcols = left.columns
    rstruct = F.struct(*[F.col(c) for c in right_payload])
    l = left.select(
        F.col(on), F.col(ts), F.lit(1).alias("_is_left"), F.struct(*lcols).alias("_l")
    )
    r = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("_is_left"), rstruct.alias("_r")
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # right rows sort BEFORE left rows at the same ts (asof is <=)
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_is_left").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.withColumn("_asof", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_is_left") == 1).select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col("_asof")[c].alias(f"{c}{suffix}") for c in right_payload],
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_payload: list[str],
    suffix: str = "_right",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Per-key pd.merge_asof via applyInPandas (cogrouped)."""
    import pandas as pd

    lcols = left.columns
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"`{f.name}{suffix}` {f.dataType.simpleString()}"
            for f in right.select(*right_payload).schema.fields
        ]
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(ts)
        r = r.sort_values(ts)[[ts, *right_payload]].rename(
            columns={c: f"{c}{suffix}" for c in right_payload}
        )
        kw = {}
        if tolerance_ms is not None:
            kw["tolerance"] = pd.Timedelta(milliseconds=tolerance_ms)
        return pd.merge_asof(l, r, on=ts, direction="backward", **kw)[
            [*lcols, *[f"{c}{suffix}" for c in right_payload]]
        ]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda k, l, r: merge(l, r), schema=out_schema)
    )
