"""Deterministic corpus-sampling operators for training-data pipelines.

Everything here is a pure function of the row ids — rerunning the job,
repartitioning the data, or appending new rows never changes the fate
of an existing row (the property RNG-based ``df.sample`` lacks, and
the reason hash sampling is the standard for carving eval sets out of
a 100 TB corpus). Randomness comes from md5 over a salted id; the hex
prefix is converted to an integer so membership tests are exact
integer comparisons reproducible in any engine.

Scale notes: ``stratified_sample`` is one shuffle (window per
stratum); ``temperature_mix`` aggregates per-stratum counts (tiny) and
broadcasts them back — the corpus itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_uniform", "stratified_sample", "temperature_mix"]

#: 16^6 — the denominator for 6-hex-digit uniform draws
_HASH_SPACE = 16**6


def hash_uniform(id_col: Column, salt: str) -> Column:
    """Deterministic draw in ``[0, 16^6)`` from a salted md5 of the id.
    Integer-valued so threshold comparisons are exact cross-engine."""
    hex6 = F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 6)
    return F.conv(hex6, 16, 10).cast("long")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "strat:",
) -> DataFrame:
    """Keep the ``k`` rows with the smallest salted-hash draw per
    stratum — a deterministic per-group sample (equal representation
    across languages/sources regardless of stratum skew).

    One shuffle: ``row_number`` over (stratum, hash). The hash is the
    sort key, so which rows survive is id-determined, not
    position-determined; ``id_col`` tiebreaks to keep the order total.
    """
    key = hash_uniform(F.col(id_col), salt)
    rn = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    )
    return df.withColumn("_rn", rn).filter(F.col("_rn") <= k).drop("_rn")


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.7,
    id_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """Temperature-scaled source mixing: downsample each stratum with
    keep-rate ``(n_min / n_s) ** (1 - alpha)`` so the post-mix size
    distribution follows ``n_s ** alpha`` (the multilingual-corpus
    rebalancing scheme — alpha=1 keeps everything, alpha→0 equalizes).

    The per-stratum counts are a tiny aggregate broadcast back onto the
    corpus; the corpus itself never shuffles. Keep decisions compare an
    integer hash draw against ``floor(rate * 16^6)`` where the rate is
    rounded to 6 decimals first — the only float step is pinned to a
    precision both engines reproduce, so membership is exact.

    Returns the surviving rows with ``keep_rate`` attached.
    """
    rates = temperature_mix_rates(df, strata_col, alpha)
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(mix_keep(F.col(id_col), salt))
    )


def temperature_mix_rates(
    df: DataFrame, strata_col: str, alpha: float = 0.7
) -> DataFrame:
    """The per-stratum keep-rate table of :func:`temperature_mix` —
    ``(strata_col, keep_rate)``, one row per stratum, broadcast-size by
    construction. Split out so a pipeline that already makes a pass
    over the corpus can compute the rates on the FULL basis and apply
    :func:`mix_keep` as a filter on its own pass, instead of joining
    the corpus against a second corpus-sized membership set
    (round-12, guide §3.2: a join that a broadcast filter can replace)."""
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_n_min"))
    return counts.crossJoin(F.broadcast(n_min)).select(
        strata_col,
        F.round(
            F.pow(F.col("_n_min").cast("double") / F.col("_n"), 1.0 - alpha), 6
        ).alias("keep_rate"),
    )


def mix_keep(id_col: Column, salt: str = "mix:") -> Column:
    """The membership predicate of :func:`temperature_mix`, applicable
    wherever a ``keep_rate`` column (from
    :func:`temperature_mix_rates`) is in scope. Kept as the single
    definition of the draw-vs-threshold comparison so the mix decision
    can never diverge between the standalone operator and a fused
    pipeline pass."""
    thresh = F.floor(F.col("keep_rate") * _HASH_SPACE).cast("long")
    return hash_uniform(id_col, salt) < thresh
