"""Column-expression libraries: text analysis, vector similarity, JSON."""

from real_time_rides_data_pipeline_spark.functions import jsonx, text, vectors

__all__ = ["text", "vectors", "jsonx"]
