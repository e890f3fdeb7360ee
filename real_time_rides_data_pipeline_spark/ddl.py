"""Gold-layer DDL twin (SURVEY.md §2.1 ``ddl_create``).

The reference creates its Gold table with SQL DDL — typed columns, USING
DELTA, LOCATION, plus a target-file-size conf
(/root/reference/src/03_gold_realtime_rides.py:71-87). Twin: the identical
CREATE TABLE issued through ``spark.sql``, USING PARQUET in this container
(USING DELTA automatically when delta-spark is on the classpath), with the
file-size knob mapped to the parquet-side levers: the reference's
``delta.optimize.maxFileSize = 128 MiB`` becomes
``spark.sql.files.maxPartitionBytes`` (scan tasks bounded to the same size)
— write-side file sizing on parquet is per-writer (``maxRecordsPerFile``),
which callers set where they know row width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from real_time_rides_data_pipeline_spark.sinks import HAVE_DELTA

#: Column/type pairs exactly as the reference DDL declares them (03:77-87).
GOLD_DDL_COLUMNS: tuple[tuple[str, str], ...] = (
    ("window_start", "TIMESTAMP"),
    ("window_end", "TIMESTAMP"),
    ("driver_id", "STRING"),
    ("total_rides_hourly", "BIGINT"),
    ("avg_fare_hourly", "DOUBLE"),
    ("total_suspicious_rides_hourly", "BIGINT"),
    ("processing_time", "TIMESTAMP"),
)

#: The reference's Delta optimize target (03:75) — 128 MiB.
GOLD_TARGET_FILE_BYTES = 134217728


def create_gold_table(
    spark: SparkSession,
    table: str = "rides_gold",
    location: str | None = None,
    drop_first: bool = False,
) -> str:
    """Issue the Gold CREATE TABLE DDL; returns the table name.

    ``CREATE TABLE IF NOT EXISTS`` like the reference (re-running the
    notebook must not error); ``drop_first`` gives tests a clean slate.
    """
    if drop_first:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(GOLD_TARGET_FILE_BYTES))
    fmt = "DELTA" if HAVE_DELTA else "PARQUET"
    cols = ",\n  ".join(f"{name} {typ}" for name, typ in GOLD_DDL_COLUMNS)
    loc = f"\nLOCATION '{location}'" if location else ""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols}\n) USING {fmt}{loc}")
    return table


def insert_overwrite(df: DataFrame, table: str) -> None:
    """INSERT OVERWRITE the table from a DataFrame whose columns are already
    in DDL order (insertInto matches by position, like SQL INSERT)."""
    df.write.mode("overwrite").insertInto(table)
