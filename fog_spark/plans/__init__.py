from fog_spark.plans.engine import Algorithm, ScatterGatherEngine, RunResult  # noqa: F401
from fog_spark.plans.checkpoint import CheckpointStore  # noqa: F401
