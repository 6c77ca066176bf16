"""Streaming frequency sketches: count-min over unbounded key streams.

The batch gate (``x_countmin_sketch``) proves the sketch algebra
against a SQL oracle; this module runs the SAME cell mapping as a
Structured Streaming stateful aggregation. The state story is the whole
point: a streaming ``groupBy(key).count()`` over an unbounded key
domain grows state without bound, while the CMS keeps EXACTLY d×w
counter rows forever — the estimate degrades (one-sided overcount, by
εN with ε = e/w at δ = e^-d confidence) instead of the state growing.

Mergeability is the second property streams need: cells add, so
per-partition partial sketches, per-window sketches, and per-day
sketches all combine with a union + sum — the same shape Spark's
partial aggregation already exploits inside one query, made explicit
across queries/checkpoints by :func:`merge_sketches`.

Cell mapping is seeded md5 (engine-portable, deterministic), identical
to the gate's oracle SQL — a streaming sketch can be handed to the
batch estimator and vice versa.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_cells", "cms_sketch", "cms_estimate", "merge_sketches"]


def _bucket(key: Column, i: int, w: int, prefix: str) -> Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{prefix}{i}:"), key)), 1, 8), 16, 10
        ).cast("long")
        % w
    )


def cms_cells(
    df: DataFrame, key_col: str, d: int = 4, w: int = 1024, prefix: str = "cms"
) -> DataFrame:
    """Map each key occurrence to its d (row, bucket) cells.

    Works identically on batch and streaming frames — a projection +
    explode, no state."""
    key = F.col(key_col).cast("string")
    return df.select(
        F.posexplode(
            F.array(*[_bucket(key, i, w, prefix) for i in range(d)])
        ).alias("row", "bucket")
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    prefix: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """The sketch: ``(row, bucket, c)``. On a batch frame this is one
    partial-aggregated shuffle to ≤ d×w rows; on a streaming frame it
    is a stateful aggregation whose state is BOUNDED at d×w rows no
    matter how many distinct keys the stream carries (use
    ``outputMode("complete")`` — the result set itself is tiny).

    ``weight_col``: ingest pre-counted keys — ``cms_sketch(kc, "k",
    weight_col="cnt")`` over a ``(key, cnt)`` table equals the sketch
    of the raw stream EXACTLY (cells add, so weighting is the same
    algebra as mergeability). When the key domain is bounded
    (vocabularies, categories), folding the stream to value grain
    first turns d×|stream| hash computations into d×|domain| — the
    x_countmin_sketch gate's plan at corpus scale.

    PRECONDITION: weights must be non-null and non-negative — a NULL
    weight would be skipped by ``sum`` (silently diverging from the
    raw-stream path, where every row counts 1) and a negative weight
    would break the one-sided-overcount guarantee this module
    documents.  Enforced per-row with ``raise_error`` (a codegen'd
    branch, no extra pass): a count table with NULL/negative counts is
    malformed input, not a weighting choice."""
    if weight_col is None:
        return (
            cms_cells(df, key_col, d, w, prefix)
            .groupBy("row", "bucket")
            .agg(F.count("*").alias("c"))
        )
    key = F.col(key_col).cast("string")
    wcol = F.col(weight_col)
    checked_w = F.when(
        wcol.isNull() | (wcol < 0),
        F.raise_error(
            F.concat(
                F.lit(f"cms_sketch: weight_col '{weight_col}' must be "
                      "non-null and non-negative, got "),
                F.coalesce(wcol.cast("string"), F.lit("NULL")),
            )
        ).cast(df.schema[weight_col].dataType),
    ).otherwise(wcol)
    return (
        df.select(
            checked_w.alias("_cms_w"),
            F.posexplode(
                F.array(*[_bucket(key, i, w, prefix) for i in range(d)])
            ).alias("row", "bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.sum("_cms_w").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    prefix: str = "cms",
) -> DataFrame:
    """Point estimates for ``keys``: min over the d row counters.

    The sketch is ≤ d×w rows — broadcast by construction — so
    estimating any number of keys is d broadcast joins, never a
    shuffle of the key table. Missing cells count 0 (keys the sketch
    never saw)."""
    key = F.col(key_col).cast("string")
    est = keys.select(
        key_col, *[_bucket(key, i, w, prefix).alias(f"_h{i}") for i in range(d)]
    )
    for i in range(d):
        si = sketch.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"_h{i}"), F.col("c").alias(f"_c{i}")
        )
        est = est.join(F.broadcast(si), f"_h{i}", "left")
    counters = [F.coalesce(F.col(f"_c{i}"), F.lit(0)) for i in range(d)]
    return est.select(
        key_col, F.least(*counters).cast("bigint").alias("est_cnt")
    )


def merge_sketches(*sketches: DataFrame) -> DataFrame:
    """Combine sketches built over disjoint (or overlapping) slices:
    cells add. sketch(A ⊎ B) == merge(sketch(A), sketch(B)) exactly —
    the property that lets per-day sketches roll up to months without
    touching raw data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("c").alias("c"))
