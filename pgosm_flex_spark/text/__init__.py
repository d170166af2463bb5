from pgosm_flex_spark.text import analysis, dedup  # noqa: F401
