from pgosm_flex_spark.streaming import incremental  # noqa: F401
