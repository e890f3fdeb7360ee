"""Kafka streaming source builder.

Mirrors the reference's Kafka ingestion contract
(``/root/reference/src/01_bronze_realtime_rides.py:26-42,66-71``): topic
``rides_stream``, earliest offsets, SASL auth pulled from the environment.
This container has no Kafka broker or kafka-sql jars — the builder is config
only and is exercised in production; tests use the file/rate source twins
(``files.py``) which produce identical downstream DataFrames, and the
readStream → parse → sink chain is additionally proven against a LIVE
network source (the built-in socket source fed by a local TCP server,
tests/test_streaming.py::test_socket_source_streams_live_lines) — the
closest in-container analog to a broker read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_options(
    bootstrap_servers: str,
    topic: str = "rides_stream",
    starting_offsets: str = "earliest",
    sasl_username: str | None = None,
    sasl_password: str | None = None,
) -> dict[str, str]:
    """Option dict for a Kafka source (reference: 01:26-42)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # Backpressure at scale: cap per-trigger intake so one giant backlog
        # doesn't produce an unbounded first micro-batch.
        "maxOffsetsPerTrigger": "5000000",
        "failOnDataLoss": "false",
    }
    if sasl_username is not None:
        opts.update(
            {
                "kafka.security.protocol": "SASL_SSL",
                "kafka.sasl.mechanism": "PLAIN",
                "kafka.sasl.jaas.config": (
                    "org.apache.kafka.common.security.plain.PlainLoginModule required "
                    f'username="{sasl_username}" password="{sasl_password}";'
                ),
            }
        )
    return opts


def kafka_stream(spark: SparkSession, **kwargs) -> DataFrame:
    """``spark.readStream.format("kafka")`` with the reference's options.

    Raises a clear error when the kafka connector jar is absent (this test
    container), keeping the rest of the engine importable.
    """
    try:
        return (
            spark.readStream.format("kafka").options(**kafka_options(**kwargs)).load()
        )
    except Exception as exc:  # pragma: no cover - no kafka jar in test image
        raise RuntimeError(
            "Kafka source unavailable (spark-sql-kafka jar not on classpath). "
            "Use sources.parquet_stream for local replay."
        ) from exc
