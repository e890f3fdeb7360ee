"""Source builders: batch/stream readers for fixtures, Kafka, and rate sources."""

from real_time_rides_data_pipeline_spark.sources.fixtures import (
    load_fixture,
    load_fixtures,
)
from real_time_rides_data_pipeline_spark.sources.kafka import kafka_stream
from real_time_rides_data_pipeline_spark.sources.files import (
    parquet_batch,
    parquet_stream,
)

__all__ = [
    "load_fixture",
    "load_fixtures",
    "kafka_stream",
    "parquet_batch",
    "parquet_stream",
]
