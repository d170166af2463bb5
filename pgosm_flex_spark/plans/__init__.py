from pgosm_flex_spark.plans.checkpoint import Checkpointer  # noqa: F401
from pgosm_flex_spark.plans.import_mode import ImportMode  # noqa: F401
