"""Property-based merge invariants (hypothesis).

The invariants that make the lakehouse safe to operate incrementally:

1. **Idempotency** — canonicalize(canonicalize(x)) == canonicalize(x)
2. **Incremental-merge consistency** — merging in two steps equals
   merging once: canonicalize(canonicalize(a) ∪ b) == canonicalize(a ∪ b)
   (this is why a partial merge + later append + re-merge never loses
   or resurrects rows)
3. **Order independence** — input row order never changes the result.
"""

from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ftm_lakehouse_spark.operators.merge import canonicalize

from .helpers import make_df, stmt

SEENS = ["2024-01-01T00:00:00", "2024-01-02T00:00:00", "2024-01-03T00:00:00"]


@st.composite
def statement_rows(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = []
    for _i in range(n):
        frag = draw(st.sampled_from(["", "", "f1", "f2"]))
        seen = draw(st.sampled_from(SEENS))
        deleted = draw(st.booleans()) and draw(st.booleans())  # ~25%
        # producer contract: ids are content hashes over (entity, prop,
        # value) — without this, merge tie-breaks among equal
        # (last_seen, deleted_at) rows would be genuinely ambiguous
        # (they are in the reference too)
        eid = f"e{draw(st.integers(0, 2))}"
        prop = draw(st.sampled_from(["name", "alias"]))
        value = f"v{draw(st.integers(0, 2))}"
        rows.append(
            stmt(
                id=f"{eid}:{prop}:{value}",
                entity_id=eid,
                prop=prop,
                value=value,
                fragment=frag,
                origin=draw(st.sampled_from(["o1", "o2"])),
                first_seen=draw(st.sampled_from(SEENS)),
                last_seen=seen,
                deleted_at=seen if deleted else None,
            )
        )
    return rows


def key(r):
    return (
        r["id"], r["entity_id"], r["prop"], r["value"], r["fragment"],
        r["origin"], r["first_seen"], r["last_seen"], r["deleted_at"],
    )


def canon_set(spark, rows):
    return sorted(key(r) for r in canonicalize(make_df(spark, rows)).collect())


SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=statement_rows())
@SET
def test_idempotent(spark, rows):
    once = canonicalize(make_df(spark, rows))
    assert sorted(key(r) for r in once.collect()) == sorted(
        key(r) for r in canonicalize(once).collect()
    )


@given(rows=statement_rows(), split=st.integers(min_value=0, max_value=12))
@SET
def test_incremental_merge_consistency(spark, rows, split):
    split = min(split, len(rows))
    a, b = rows[:split], rows[split:]
    # two-step: canonicalize the first batch, append the second, re-merge
    stepwise = canonicalize(
        canonicalize(make_df(spark, a)).unionByName(make_df(spark, b))
    )
    oneshot = canon_set(spark, rows)
    assert sorted(key(r) for r in stepwise.collect()) == oneshot


@given(rows=statement_rows(), seed=st.randoms())
@SET
def test_order_independence(spark, rows, seed):
    shuffled = list(rows)
    seed.shuffle(shuffled)
    assert canon_set(spark, rows) == canon_set(spark, shuffled)


# ---------------------------------------------------------------------
# Cross-validation: the two as-of join implementations must agree
# (window carry-forward vs cogrouped pd.merge_asof) on arbitrary inputs.
# ---------------------------------------------------------------------

@st.composite
def asof_frames(draw):
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    keys = ["a", "b"]
    n_l = draw(st.integers(1, 8))
    n_r = draw(st.integers(0, 8))
    left = [
        (
            i,
            draw(st.sampled_from(keys)),
            base + timedelta(seconds=draw(st.integers(0, 120))),
        )
        for i in range(n_l)
    ]
    right = [
        (
            draw(st.sampled_from(keys)),
            base + timedelta(seconds=draw(st.integers(0, 120))),
            float(100 + j),
        )
        for j in range(n_r)
    ]
    return left, right


@given(frames=asof_frames())
@SET
def test_asof_window_matches_pandas(spark, frames):
    from ftm_lakehouse_spark.operators.asof import asof_join, asof_join_pandas

    left_rows, right_rows = frames
    left = spark.createDataFrame(left_rows, "lid long, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")
    # dedupe right per (k, ts): ties there are implementation-defined in
    # BOTH engines (last-in-sort vs merge_asof's last row) — the
    # operator contract requires a unique right key per timestamp
    right = right.dropDuplicates(["k", "ts"])

    a = {r["lid"]: r["v_right"] for r in
         asof_join(left, right, on="k", ts="ts", right_payload=["v"]).collect()}
    b = {r["lid"]: r["v_right"] for r in
         asof_join_pandas(left, right, on="k", ts="ts", right_payload=["v"]).collect()}
    assert a == b
