from pgosm_flex_spark.images import codec  # noqa: F401
