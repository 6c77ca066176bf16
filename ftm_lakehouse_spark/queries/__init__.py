from ftm_lakehouse_spark.queries.inventory import QUERIES, oracle_map, query_map  # noqa: F401
