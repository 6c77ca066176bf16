from ftm_lakehouse_spark.streaming.journal import StreamingJournal  # noqa: F401
