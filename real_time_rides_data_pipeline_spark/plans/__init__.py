"""Plan-shaping utilities: parallelism guards, explain helpers."""

from real_time_rides_data_pipeline_spark.plans.shape import (
    ensure_parallelism,
    explain_str,
)

__all__ = ["ensure_parallelism", "explain_str"]
