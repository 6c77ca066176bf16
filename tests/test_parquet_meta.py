"""Footer-stats operator vs DuckDB's parquet_metadata() — the two
engines read the same footers, so every count and integer min/max must
agree exactly."""

from __future__ import annotations

import duckdb

from ftm_lakehouse_spark.sources.parquet_meta import parquet_rowgroup_stats

INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey"]


def test_rowgroup_stats_match_duckdb(spark):
    path = "/root/testdata/sf0.01/lineitem.parquet"
    got = {
        (r["row_group"], r["col_name"]): (
            r["num_values"], r["null_count"], int(r["min_v"]), int(r["max_v"])
        )
        for r in parquet_rowgroup_stats(spark, [path], INT_COLS).collect()
    }
    truth = {
        (rg, col): (nv, nc, int(mn), int(mx))
        for rg, col, nv, nc, mn, mx in duckdb.sql(
            f"""SELECT row_group_id, path_in_schema, num_values,
                       stats_null_count, stats_min_value, stats_max_value
                FROM parquet_metadata('{path}')
                WHERE path_in_schema IN ({','.join(repr(c) for c in INT_COLS)})"""
        ).fetchall()
    }
    assert got == truth and len(got) >= len(INT_COLS)


def test_rowgroup_stats_drive_a_skipping_decision(spark, tmp_path):
    # write a clustered two-file table; the stats frame must show
    # disjoint min/max ranges — the property skipping depends on
    df = spark.range(1000).selectExpr("id", "id % 7 AS v")
    lo, hi = str(tmp_path / "lo"), str(tmp_path / "hi")
    df.where("id < 500").coalesce(1).write.parquet(lo)
    df.where("id >= 500").coalesce(1).write.parquet(hi)
    import glob

    paths = glob.glob(f"{lo}/*.parquet") + glob.glob(f"{hi}/*.parquet")
    stats = parquet_rowgroup_stats(spark, paths, ["id"]).collect()
    ranges = sorted((int(r["min_v"]), int(r["max_v"])) for r in stats)
    assert ranges == [(0, 499), (500, 999)]
    # a point query for id=250 prunes to exactly one file on stats alone
    hit = [r["file"] for r in stats if int(r["min_v"]) <= 250 <= int(r["max_v"])]
    assert len(hit) == 1
