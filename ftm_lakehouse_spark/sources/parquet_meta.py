"""Parquet footer introspection as a DataFrame — the metadata surface
that file/row-group skipping decisions read (O1/O2 clustering, z-order
pruning, bloom filters all act THROUGH these stats; reference analog:
the min/max file-stat pruning DuckDB applies in logic/parquet.py).

``parquet_rowgroup_stats`` distributes footer reads across the
cluster: one task per file, each opening ONLY the footer via pyarrow
(no data pages touched), emitting one row per (file, row_group,
column) with value counts, null counts and min/max statistics.
Correctness is pinned against DuckDB's ``parquet_metadata()`` over the
same files in tests/test_parquet_meta.py.

Scale: a 100 TB table is ~100k files; footer reads are a few KB each
and embarrassingly parallel — the whole-table stats frame materializes
in seconds and is itself queryable (e.g. "which partitions' row groups
overlap this key range" = the planning query behind manual compaction
or clustering audits).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["parquet_rowgroup_stats"]

_SCHEMA = (
    "file string, row_group int, col_name string, num_values long,"
    " null_count long, min_v string, max_v string"
)


def parquet_rowgroup_stats(
    spark: SparkSession, paths: list[str], columns: list[str] | None = None
) -> DataFrame:
    """One row per (file, row_group, column) of footer statistics.
    min/max are emitted as strings (stable across logical types);
    ``columns=None`` emits every leaf column."""
    import pandas as pd

    wanted = set(columns) if columns is not None else None

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["path"]:
                meta = pq.ParquetFile(path).metadata
                for rg in range(meta.num_row_groups):
                    group = meta.row_group(rg)
                    for ci in range(group.num_columns):
                        chunk = group.column(ci)
                        name = chunk.path_in_schema
                        if wanted is not None and name not in wanted:
                            continue
                        stats = chunk.statistics
                        out.append(
                            (
                                path,
                                rg,
                                name,
                                chunk.num_values,
                                stats.null_count if stats else None,
                                str(stats.min) if stats and stats.has_min_max else None,
                                str(stats.max) if stats and stats.has_min_max else None,
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "file", "row_group", "col_name", "num_values",
                    "null_count", "min_v", "max_v",
                ],
            )

    files = spark.createDataFrame([(p,) for p in paths], "path string")
    # one footer per task: tiny reads, embarrassingly parallel
    return files.repartition(max(len(paths), 1)).mapInPandas(read_footers, _SCHEMA)
