from pgosm_flex_spark.geometry import kernels, wkb  # noqa: F401
