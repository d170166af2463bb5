from pgosm_flex_spark.index import cells, tiles  # noqa: F401
