from ftm_lakehouse_spark.model.statement import (  # noqa: F401
    CSV_COLUMNS,
    MERGE_GROUP_FRAGMENT,
    MERGE_GROUP_NONFRAGMENT,
    PARTITION_COLUMNS,
    STATEMENT_COLUMNS,
    STATEMENT_SCHEMA,
    WRITE_SORT_COLUMNS,
)
from ftm_lakehouse_spark.model.dataset import DatasetConfig  # noqa: F401
