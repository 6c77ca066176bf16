"""Z-order write clustering: multi-dimensional data skipping for plain
parquet (the Delta ``OPTIMIZE ZORDER BY`` analog; reference's north
star is Delta — BASELINE.json — whose zordering serves point lookups
on columns other than the sort key).

A single-column clustering sort (statement_store's entity_id sort)
gives tight min/max file stats on ONE column; queries filtering on a
second column read every file. Interleaving the bit representations of
k rank-normalized columns into one sort key gives every interleaved
column *partially* tight min/max ranges per file, so the parquet
footer check prunes on any of them — typically 60-90% of files for a
point predicate, vs 0% for non-sort columns under a linear sort.

Spark-first shape:
  * normalization is one tiny aggregate (min/max) or one driver-side
    ``approxQuantile`` (sample-bounded, the same strategy Delta's
    range-id uses) broadcast back into the plan as literals;
  * the z-value is a pure JVM expression (shifts/masks — whole-stage
    codegen, no Python, no shuffle of its own);
  * ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` is one
    range shuffle — the same cost the write's clustering sort already
    pays, now serving k columns instead of 1.

At 100 TB: the min/max agg is a metadata-cheap scan; approxQuantile
samples; the range shuffle is the standard write path. Skew in any
dimension is absorbed by quantile mode (equal-population buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_frame"]


def _interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each bucket column into one long:
    bit j of column i lands at position j * k + i (MSB-significant
    across columns). Pure shift/mask arithmetic — codegen-friendly,
    literal shift amounts."""
    k = len(bucket_cols)
    terms = []
    for i, c in enumerate(bucket_cols):
        c = c.cast("long")
        for j in range(bits):
            terms.append(F.shiftleft(F.shiftright(c, j).bitwiseAND(F.lit(1)), j * k + i))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    mode: str = "minmax",
) -> Column:
    """The z-value expression for ``df[cols]``.

    ``minmax``: each column is scaled to [0, 2^bits) by its global
    min/max — one 2k-value aggregate, exact, but skewed columns waste
    bucket space. ``quantile``: bucket boundaries from
    ``approxQuantile`` (equal-population buckets, robust to skew; the
    boundary fold is a JVM higher-order aggregate over ≤2^bits literal
    boundaries — keep ``bits`` ≤ 8 in this mode).

    Nulls sort first (bucket 0). Total bits k*bits must fit a long."""
    k = len(cols)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits overflows the z long")
    n_buckets = 1 << bits
    buckets: list[Column] = []
    if mode == "minmax":
        bounds = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cols)],
            *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cols)],
        ).collect()[0]
        for i, c in enumerate(cols):
            lo, hi = bounds[f"lo_{i}"], bounds[f"hi_{i}"]
            if lo is None or hi is None or hi <= lo:
                buckets.append(F.lit(0))
                continue
            scaled = F.floor(
                (F.col(c).cast("double") - F.lit(lo))
                * F.lit((n_buckets - 1) / (hi - lo))
                + F.lit(0.5)
            )
            buckets.append(F.coalesce(scaled, F.lit(0)))
    elif mode == "quantile":
        if bits > 8:
            raise ValueError("quantile mode: bits must be <= 8 (boundary literals)")
        probs = [i / n_buckets for i in range(1, n_buckets)]
        dbl = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
        all_bounds = dbl.stat.approxQuantile(cols, probs, 0.001)
        for c, bs in zip(cols, all_bounds):
            # dedupe degenerate boundaries (constant-ish columns)
            uniq = sorted(set(bs))
            from ftm_lakehouse_spark.functions.vectors import lit_doubles

            # up to 255 boundary literals — one F.expr round trip
            arr = lit_doubles(uniq)
            v = F.col(c).cast("double")
            bucket = F.aggregate(
                arr,
                F.lit(0).cast("long"),
                lambda acc, b: acc + F.when(v >= b, 1).otherwise(0),
            )
            buckets.append(F.coalesce(bucket, F.lit(0)))
    else:
        raise ValueError(f"unknown zorder mode {mode!r}")
    return _interleave(buckets, bits)


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    mode: str = "minmax",
    num_files: int | None = None,
) -> DataFrame:
    """``df`` redistributed and sorted for a z-ordered write: one range
    shuffle on the z-value, z-sorted within partitions, ready for
    ``.write.parquet``. ``num_files`` bounds output file count
    (default: the session's shuffle parallelism)."""
    z = zorder_value(df, cols, bits=bits, mode=mode).alias("_z")
    n = num_files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
