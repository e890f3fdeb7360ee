"""Micro-batch replay: drive any streaming query from a parquet directory,
one file per trigger — the local stand-in for a Kafka topic (tests,
benchmarks, backfills).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from real_time_rides_data_pipeline_spark.sources.files import parquet_stream


def replay_stream(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    files_per_trigger: int = 1,
) -> DataFrame:
    return parquet_stream(spark, input_dir, schema, files_per_trigger)


def run_to_completion(query) -> None:
    """Process every available micro-batch synchronously, then stop —
    deterministic stream execution for tests."""
    try:
        query.processAllAvailable()
    finally:
        query.stop()
