"""Staged DuckDB oracles for gates whose single-statement oracle SQL
exceeds DuckDB's capacity at sweep scale (sf10, 60M lineitem).

The DRIVER contract is untouched: ``oracle_sql()`` still publishes one
static ANSI-SQL string per gate, and the driver (and this harness by
default) runs exactly that at sf0.01. A staged oracle is the SAME
computation restructured as a sequence of ``CREATE TEMP TABLE``
statements so each unrolled iteration materializes, frees its inputs,
and never holds the whole CTE chain's intermediates at once —
``check_parity.py --staged`` (or ``PARITY_STAGED=1``) switches to it
for the gates registered here.

``graph_pagerank``: the unrolled 3-iteration CTE chain keeps every
edge-sized contribution table live simultaneously (>72 GB temp at
sf10 — NOTES_r4, the one 107/108 miss). Staged: edges/deg
materialize once, then per iteration one contribution-sum table and
one rank table, previous iteration dropped before the next starts —
peak is O(edges) once plus O(nodes) twice. Arithmetic is the identical
integer fixed-point algebra (scale 1e12, damping 85/100, floor
division), so the hash must match bit-for-bit.
"""

from __future__ import annotations

import pandas as pd

_PAGERANK_SETUP = [
    """
    CREATE OR REPLACE TEMP TABLE pr_edges AS
    WITH pairs AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    )
    SELECT 'c:' || c AS src, 's:' || s AS dst FROM pairs
    UNION ALL
    SELECT 's:' || s AS src, 'c:' || c AS dst FROM pairs
    """,
    """
    CREATE OR REPLACE TEMP TABLE pr_deg AS
    SELECT src AS node, count(*) AS d FROM pr_edges GROUP BY src
    """,
]


def pagerank_staged(con) -> pd.DataFrame:
    for stmt in _PAGERANK_SETUP:
        con.execute(stmt)
    n = con.execute("SELECT count(*) FROM pr_deg").fetchone()[0]
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE pr_r AS "
        f"SELECT node, 1000000000000 // {n} AS r FROM pr_deg"
    )
    for _ in range(3):
        # one edges⋈ranks join + dst-grouped sum of per-edge floor-div
        # contributions — identical to the static oracle's c{i}/s{i}
        # pair (sum of r//d per dst), materialized then inputs freed
        con.execute(
            """
            CREATE OR REPLACE TEMP TABLE pr_s AS
            SELECT e.dst AS node, sum(r.r // d.d) AS s
            FROM pr_edges e
            JOIN pr_r r ON e.src = r.node
            JOIN pr_deg d ON e.src = d.node
            GROUP BY e.dst
            """
        )
        con.execute(
            f"""
            CREATE OR REPLACE TEMP TABLE pr_r_next AS
            SELECT deg.node,
                   CAST(15000000000000 // (100 * {n})
                        + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
            FROM pr_deg deg LEFT JOIN pr_s s ON deg.node = s.node
            """
        )
        con.execute("DROP TABLE pr_s")
        con.execute("DROP TABLE pr_r")
        con.execute("ALTER TABLE pr_r_next RENAME TO pr_r")
    out = con.execute("SELECT node, r AS rank FROM pr_r").fetchdf()
    con.execute("DROP TABLE pr_r")
    con.execute("DROP TABLE pr_deg")
    con.execute("DROP TABLE pr_edges")
    return out


STAGED = {"graph_pagerank": pagerank_staged}
