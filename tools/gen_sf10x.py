"""Synthesize a one-decade-up table set (~sf1) by replicating sf0.1.

Round-3 VERDICT item 6: the sf0.1 parity sweep caught a real
boundary-rounding divergence (w_percent_rank), so push the whole gate
inventory one more decade. This tool writes a referentially
consistent R× replica of every sf0.1 table (default R=10 → ~6M
lineitem rows) that `tools/check_parity.py <out_dir>` can sweep
directly — both engines read the same files, so the comparison is
still exact.

Replication preserves the star schema: every BIGINT entity key is
offset by `replica * 1e9`, and foreign keys are offset by the SAME
constant, so each replica is an isolated consistent universe (joins
never cross replicas; group cardinalities scale ×R; per-key group
sizes stay constant — deliberately, since a 10× *duplication* stress
is a different axis, covered by tools/stress_corpus.py). nation and
region are fixed dimensions referenced by unchanged INTEGER keys and
are copied as-is. events.ts is read from the driver's TIMESTAMP(NANOS)
file by DuckDB (µs truncation — the same value the engine's
nanosAsLong path produces) and written back as standard µs, which
sources/tables.py handles via its type-adaptive branch.

Usage: python tools/gen_sf10x.py [R] [src_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 1_000_000_000  # per-replica key offset, >> any sf0.1 key

# table -> columns to offset per replica (BIGINT keys only)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def generate(R: int, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"t.{c} + r.rep * {OFF} AS {c}" if c in keys else f"t.{c}"
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{src}/{t}.parquet') t, "
            f"(SELECT unnest(range({R})) AS rep) r "
            f"ORDER BY {', '.join(keys)}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.sweep/sf1"
    generate(R, src, out)
    print(f"wrote {out}; sweep with: python tools/check_parity.py {out}")
