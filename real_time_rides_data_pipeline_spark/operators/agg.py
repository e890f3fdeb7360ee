"""Aggregation operators — the flagship hourly windowed aggregate + re-aggs.

Reference: /root/reference/src/03_gold_realtime_rides.py:46-67 — groupBy
(1-hour tumbling window on event_timestamp × driver_id) with count / rounded
avg / conditional sum; verification re-agg at verify_gold_layer_data.py:37-41.

Physical shape: partial HashAggregate → Exchange(hash by window,key) → final
HashAggregate. Map-side combine means the shuffle carries one row per
(window × key) per input partition — at 100 TB with bounded key cardinality
this is the cheapest possible shuffle; no salting needed unless a single
key×hour dominates (AQE skew handling covers that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def money_avg_2dp(col_name: str) -> Column:
    """``round(avg(x), 2)`` computed exactly for money-typed (≤2 dp) inputs.

    ``avg`` over doubles is summation-order dependent, and rounding a double
    that sits on the half-cent boundary differs across engines (Spark rounds
    the shortest decimal representation HALF_UP; C-family engines round the
    binary value). Summing exact integer cents, dividing once, and rounding
    once is deterministic and engine-portable: half-cent boundaries are
    exactly representable doubles, rounded away-from-zero by both Spark and
    DuckDB. Aggregation stays JVM-side (partial + final hash agg).
    """
    cents = F.round(F.col(col_name) * 100).cast("long")
    return F.round(F.sum(cents) / F.count(col_name)) / 100.0


def hourly_driver_agg(
    df: DataFrame,
    ts_col: str = "event_timestamp",
    key_col: str = "driver_id",
    id_col: str = "ride_id",
    fare_col: str = "fare",
    suspicious_col: str = "is_suspicious",
    window_duration: str = "1 hour",
    with_processing_time: bool = False,
) -> DataFrame:
    """Flagship: tumbling-window grouped aggregate (03:46-67).

    Output columns follow the Gold DDL (03:77-87): window_start, window_end,
    <key>, total_rides_hourly, avg_fare_hourly (2-dp round, 03:53),
    total_suspicious_rides_hourly (count-if idiom, 03:54-55).
    ``processing_time`` (03:57) is opt-in because it is non-deterministic and
    excluded from oracle comparison (SURVEY.md §7.4).
    """
    out = (
        df.groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count(id_col).alias("total_rides_hourly"),
            money_avg_2dp(fare_col).alias("avg_fare_hourly"),
            F.sum(
                F.when(F.col(suspicious_col), 1).otherwise(0)
            ).alias("total_suspicious_rides_hourly"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col(key_col),
            "total_rides_hourly",
            "avg_fare_hourly",
            "total_suspicious_rides_hourly",
        )
    )
    if with_processing_time:
        out = out.withColumn("processing_time", F.current_timestamp())
    return out


def reaggregate_gold(df: DataFrame, key_col: str = "driver_id") -> DataFrame:
    """Second-level re-aggregation over Gold (verify_gold_layer_data.py:37-41):
    per window_start — distinct keys, total rides, total suspicious, newest
    first. Used as the pipeline-consistency invariant (Σ gold counts = silver
    row count)."""
    return (
        df.groupBy("window_start")
        .agg(
            F.countDistinct(key_col).alias("active_drivers"),
            F.sum("total_rides_hourly").alias("total_rides"),
            F.sum("total_suspicious_rides_hourly").alias("total_suspicious"),
        )
        .orderBy(F.col("window_start").desc())
    )
