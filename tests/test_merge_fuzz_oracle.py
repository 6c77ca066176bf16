"""Seeded randomized merge fuzz against a DuckDB oracle of the
REFERENCE's two-branch dedupe SQL (VERDICT r9 item 7).

The merge is the semantic heart of the engine and its goldens are
hand-built; `tests/test_merge_properties.py` checks internal
invariants (idempotency, incrementality, order independence) but not
agreement with the reference. Here ~200 seeded random statement sets —
fragments, multi-valued props, tombstones (with the write contract's
``last_seen = deleted_at`` bump), ties at second granularity,
multi-origin, re-emission — run through BOTH:

* ``operators.merge.canonicalize`` (the Spark window stack), and
* the reference's ``_dedupe_sql`` two-branch QUALIFY SQL
  (reference/ftm_lakehouse/logic/parquet.py:72-162), executed verbatim
  by DuckDB over the identical rows,

and the full result frames must match row-for-row. Any divergence
found here becomes a golden in test_merge.py.
"""

import random
from datetime import datetime, timedelta

import pytest

from ftm_lakehouse_spark.model.statement import STATEMENT_COLUMNS
from ftm_lakehouse_spark.operators.merge import canonicalize

from .helpers import make_df, stmt

#: the reference's _dedupe_sql skeleton (logic/parquet.py:125-160),
#: source = a registered DuckDB view over the same rows Spark reads;
#: {tombstone} mirrors the grace predicate build_merge_sql injects.
DEDUPE_SQL = """
WITH base AS (
    SELECT * FROM fuzz_rows
),
nonfragment_rows AS (
    SELECT * REPLACE (
        MIN(first_seen) OVER (PARTITION BY shard, bucket, origin, id) AS first_seen
    )
    FROM base
    WHERE fragment = ''
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY shard, bucket, origin, id
        ORDER BY last_seen DESC, deleted_at DESC NULLS LAST
    ) = 1
),
fragment_rows AS (
    SELECT * REPLACE (
        MIN(first_seen) OVER (
            PARTITION BY shard, bucket, origin, entity_id, prop, fragment
        ) AS first_seen
    )
    FROM base
    WHERE fragment != ''
    QUALIFY last_seen = MAX(last_seen) OVER (
        PARTITION BY shard, bucket, origin, entity_id, prop, fragment
    )
    AND ROW_NUMBER() OVER (
        PARTITION BY shard, bucket, origin, entity_id, prop, fragment, id
        ORDER BY last_seen DESC, deleted_at DESC NULLS LAST
    ) = 1
)
SELECT * FROM (
    SELECT * FROM nonfragment_rows
    UNION ALL
    SELECT * FROM fragment_rows
)
WHERE {tombstone}
"""

TS_POOL = [
    "2024-01-01T00:00:00",
    "2024-01-02T00:00:00",
    "2024-01-02T00:00:01",  # second-granularity tie neighbor
    "2024-02-01T00:00:00",
]


def _random_case(rng: random.Random) -> list[dict]:
    """One statement set exercising every merge mechanic. Producer
    contracts honored (ids content-addressed over (entity, prop,
    value); tombstones bump last_seen = deleted_at) — the reference is
    genuinely ambiguous outside them, as its own tests note."""
    rows = []
    for _ in range(rng.randint(1, 20)):
        eid = f"e{rng.randint(0, 2)}"
        prop = rng.choice(["name", "alias"])
        value = f"v{rng.randint(0, 2)}"
        fragment = rng.choice(["", "", "f1", "f2"])  # ~half non-fragment
        origin = rng.choice(["o1", "o2"])
        first = rng.choice(TS_POOL)
        last = rng.choice(TS_POOL)
        deleted = rng.random() < 0.2
        kw = dict(
            id=f"{eid}:{prop}:{value}",
            entity_id=eid,
            prop=prop,
            value=value,
            fragment=fragment,
            origin=origin,
            first_seen=first,
            last_seen=last,
            shard=rng.choice(["0", "1"]),
        )
        if deleted:
            # write contract: the tombstone's last_seen is bumped to
            # deleted_at so it wins ROW_NUMBER over the live emission
            kw["deleted_at"] = last
        rows.append(stmt(**kw))
        # re-emission: sometimes append an exact duplicate (differing
        # only in first_seen) — idempotency under re-import
        if rng.random() < 0.2:
            kw2 = dict(kw)
            kw2["first_seen"] = rng.choice(TS_POOL)
            rows.append(stmt(**kw2))
    return rows


def _oracle(duck, rows: list[dict], tombstone: str):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=STATEMENT_COLUMNS)
    # naive UTC timestamps on both engines (Spark collect() convention)
    for c in ("first_seen", "last_seen", "deleted_at"):
        pdf[c] = pd.to_datetime(pdf[c], utc=True).dt.tz_localize(None)
    duck.register("fuzz_rows", pdf)
    out = duck.execute(DEDUPE_SQL.format(tombstone=tombstone)).df()
    duck.unregister("fuzz_rows")
    return out


def _canon_frame(pdf) -> list[tuple]:
    pdf = pdf[STATEMENT_COLUMNS]
    return sorted(
        tuple(None if v != v or v is None else v for v in rec)  # NaT/None fold
        for rec in pdf.itertuples(index=False, name=None)
    )


# chunk 0 (50 randomized cases) stays in the default run; chunks 1-3
# are `slow` so the full 200-case sweep fits the driver's verify window
# via `pytest -m slow` without losing default fuzz coverage entirely
@pytest.mark.parametrize(
    "chunk",
    [0] + [pytest.param(c, marks=pytest.mark.slow) for c in (1, 2, 3)],
)
def test_canonicalize_matches_reference_sql(spark, chunk):
    """~200 randomized cases (50 per chunk for parallelizable runs),
    each compared FULL-FRAME: engine rows == oracle rows, both with
    tombstones kept (merge view) and with the grace predicate
    (reap path)."""
    import duckdb

    duck = duckdb.connect()
    grace = datetime.fromisoformat("2024-01-15T00:00:00")
    rng = random.Random(20260816 + chunk)
    for case in range(50):
        rows = _random_case(rng)
        df = make_df(spark, rows)

        # --- merge view: tombstones survive canonicalization
        got = canonicalize(df).toPandas()
        want = _oracle(duck, rows, tombstone="TRUE")
        assert _canon_frame(got) == _canon_frame(want), (
            f"chunk {chunk} case {case} (keep-tombstones) diverged"
        )

        # --- reap path: grace predicate drops old tombstones
        got_g = canonicalize(df, grace_cutoff=grace).toPandas()
        want_g = _oracle(
            duck, rows,
            tombstone=(
                "deleted_at IS NULL OR deleted_at > TIMESTAMP '2024-01-15 00:00:00'"
            ),
        )
        assert _canon_frame(got_g) == _canon_frame(want_g), (
            f"chunk {chunk} case {case} (grace-reap) diverged"
        )
