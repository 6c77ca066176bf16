"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full graded inventory from
``ftm_lakehouse_spark.queries.inventory`` — one entry per operator
family in SURVEY.md §2 plus the training-data pipeline operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ftm_lakehouse_spark.queries.inventory import q1_pricing_summary
    from ftm_lakehouse_spark.session import tune_for_local

    tune_for_local(spark)
    return q1_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ftm_lakehouse_spark.queries.inventory import query_map
    from ftm_lakehouse_spark.session import tune_for_local

    out = {}
    for name, fn in query_map().items():
        def wrapped(spark, sf_dir, _fn=fn):
            tune_for_local(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    from ftm_lakehouse_spark.queries.inventory import oracle_map

    return oracle_map()
