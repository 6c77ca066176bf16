from ftm_lakehouse_spark.sources.tables import TESTDATA_TABLES, load_table, register_views  # noqa: F401
