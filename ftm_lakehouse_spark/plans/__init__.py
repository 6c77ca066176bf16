from ftm_lakehouse_spark.plans.query import Query  # noqa: F401
