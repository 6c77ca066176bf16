"""The merge: canonicalize raw statement rows.

Semantics (reference: _dedupe_sql, /root/reference/ftm_lakehouse/logic/
parquet.py:72-162; behavioral contract from tests/test_logic_parquet.py):

Two write modes that never interact:

1. **Non-fragment** (``fragment = ''``): content-addressed dedup — at
   most one row per statement ``id`` per ``(shard, bucket, origin)``;
   the row with the greatest ``last_seen`` wins, tombstones
   (``deleted_at`` set) beat live rows at the same second.

2. **Fragment-bearing** (``fragment != ''``): supersession — a later
   emission of the same ``(origin, entity_id, prop, fragment)`` group
   replaces the earlier one entirely; **all rows tied at the group's
   max last_seen survive** (that is what keeps multi-valued properties
   of one emission alive together — last_seen is second-granularity by
   producer contract, so ties are the normal case, not an edge case).
   A per-id row_number makes re-runs idempotent.

Both branches fold ``first_seen`` to the group MIN **before** dropping
duplicate rows, so superseded rows still contribute their first
observation (reference applies the window before QUALIFY).

Spark realization: window functions + filter — ``QUALIFY`` is just a
``withColumn`` + ``filter`` here. All windows are partitioned by keys
that START with the table's physical partition columns
``(shard, bucket, origin)``, so at 100 TB the merge of one dirty
partition shuffles only that partition's rows, and the two branches'
windows share one shuffle per branch.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ftm_lakehouse_spark.model.statement import (
    MERGE_GROUP_FRAGMENT,
    MERGE_GROUP_NONFRAGMENT,
    STATEMENT_COLUMNS,
)

__all__ = ["canonicalize", "reap_tombstones"]


def canonicalize(raw: DataFrame, grace_cutoff: datetime | None = None) -> DataFrame:
    """Return the canonical view of a raw statement DataFrame.

    Reusable both as the merge job's rewrite input and as the
    dedupe-on-read view for diff exports over an un-merged store
    (SURVEY §7.4 hard-part 6 — reference applies the same SQL stack in
    both places, logic/parquet.py:195-275).

    ``grace_cutoff``: if given, tombstones whose ``deleted_at`` is at or
    before the cutoff are physically dropped (reap); newer tombstones
    are kept so late diff consumers still see the delete
    (reference: logic/parquet.py:160,264-275).
    """
    is_fragment = F.col("fragment") != ""

    # Single-scan form: both branches' windows are computed over ONE
    # pass of the input (two shuffles, as in the two-branch form, but
    # the source is read once and there is no union).
    #
    # Window 1 — per-statement group. Non-fragment rows must dedupe on
    # exactly MERGE_GROUP_NONFRAGMENT = (shard, bucket, origin, id):
    # ids are *usually* content-addressed (id determines entity_id and
    # prop) but write_statements / CSV import accept arbitrary ids, and
    # duplicate ids with differing entity_id/prop must still collapse
    # (reference _dedupe_sql keys only on id). So entity_id/prop are
    # masked to '' for non-fragment rows; fragment rows keep the full
    # per-id idempotency group.
    # ``ek`` masks to ``id`` (not a constant) for non-fragment rows:
    # any function of ``id`` added to window 1's keys leaves its group
    # exactly (shard, bucket, origin, id), and window 2 — which shares
    # these keys, see below — then hashes non-fragment rows BY ID
    # across tasks instead of collapsing every non-fragment row of a
    # physical partition into one task (guide §2.5: the shared exchange
    # must not lose window 1's fine-grained spread).
    ek = F.when(is_fragment, F.col("entity_id")).otherwise(F.col("id"))
    pk = F.when(is_fragment, F.col("prop")).otherwise(F.lit(""))
    id_group = ["shard", "bucket", "origin", ek, pk, F.col("fragment"), F.col("id")]
    w_id = W.partitionBy(*id_group)
    w_id_rank = w_id.orderBy(F.desc("last_seen"), F.desc_nulls_last("deleted_at"))
    # Window 2 — the supersession group (fragment rows only consult it).
    # Keyed on the SAME masked (ek, pk) columns as window 1 — for
    # fragment rows that is exactly MERGE_GROUP_FRAGMENT (ek=entity_id,
    # pk=prop), and for non-fragment rows the group degenerates to
    # per-id, which is harmless: both of this window's outputs
    # (_fs_frag, _max_ls) are consumed only under ``is_fragment``. The
    # shared keys make window 2's partition keys a strict SUBSET of
    # window 1's, so one hash exchange on the supersession keys serves
    # both windows (HashPartitioning satisfies any ClusteredDistribution
    # whose keys are a superset): the merge pays ONE shuffle instead of
    # two (round-12, guide §2.4 — verified in
    # plans/r12/ftm_canonicalize_after.txt; window 2 is annotated first
    # so its exchange is the one that materializes). Per-task skew bound
    # is unchanged — fragment rows stay spread by their (already
    # task-local) supersession group, non-fragment rows by id.
    w_frag = W.partitionBy("shard", "bucket", "origin", ek, pk, F.col("fragment"))

    # One select (not chained withColumn — each chained window column
    # lands in its own Window operator and pays its own Exchange; a
    # single projection lets ExtractWindowExpressions group same-spec
    # functions). ``_fs_id`` rides w_id_rank's (partition, order) spec
    # with an explicit whole-group frame — min over the full group is
    # order-independent, so it shares ONE Window operator with ``_rn``
    # instead of needing an unordered twin. Net plan: 2 Window
    # operators, 1 Exchange (was 4 and 4).
    annotated = raw.select(
        "*",
        F.min("first_seen").over(w_frag).alias("_fs_frag"),
        F.max("last_seen").over(w_frag).alias("_max_ls"),
        F.row_number().over(w_id_rank).alias("_rn"),
        F.min("first_seen").over(w_id_rank.rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )).alias("_fs_id"),
    )
    keep = (F.col("_rn") == 1) & (
        ~is_fragment | (F.col("last_seen") == F.col("_max_ls"))
    )
    out = (
        annotated
        # fold BEFORE the filter: dropped duplicates still contribute
        # their first observation (reference SELECT * REPLACE pattern)
        .withColumn(
            "first_seen",
            F.when(is_fragment, F.col("_fs_frag")).otherwise(F.col("_fs_id")),
        )
        .filter(keep)
        .drop("_rn", "_fs_id", "_fs_frag", "_max_ls")
    )
    if grace_cutoff is not None:
        out = reap_tombstones(out, grace_cutoff)
    return out.select(*STATEMENT_COLUMNS)


def reap_tombstones(df: DataFrame, grace_cutoff: datetime) -> DataFrame:
    """Drop tombstones older than the grace cutoff; keep live rows and
    recent tombstones (reference grace period, default 30 days:
    core/settings.py:31; predicate at logic/parquet.py:160)."""
    return df.filter(
        F.col("deleted_at").isNull() | (F.col("deleted_at") > F.lit(grace_cutoff))
    )
