from pgosm_flex_spark.sources import testdata  # noqa: F401
