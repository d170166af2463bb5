from pgosm_flex_spark.functions import scalars, tags  # noqa: F401
