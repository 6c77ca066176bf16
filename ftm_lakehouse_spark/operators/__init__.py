from ftm_lakehouse_spark.operators.merge import canonicalize, reap_tombstones  # noqa: F401
from ftm_lakehouse_spark.operators.aggregate import assemble_entities  # noqa: F401
