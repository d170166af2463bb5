from pgosm_flex_spark.similarity import ann  # noqa: F401
