"""Bronze→Silver parse stage: cast, JSON parse, malformed filter, struct expand.

Semantics per the reference (cited file:line are into /root/reference/src/):

- ``cast_project``      — 01_bronze_realtime_rides.py:73-76
- ``parse_json_events`` — 02_silver_realtime_rides.py:46-47 (schema 02:25-34)
- ``drop_malformed``    — 02_silver_realtime_rides.py:48
- ``expand_struct``     — 02_silver_realtime_rides.py:49
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_rides_data_pipeline_spark.schemas import RIDE_SCHEMA


def cast_project(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "timestamp",
    out_col: str = "raw_json_data",
) -> DataFrame:
    """Kafka landing projection: ``CAST(value AS STRING)`` + keep the broker
    timestamp, dropping all other Kafka metadata columns (column pruning at
    the source — Catalyst prunes the scan to exactly these two columns).
    """
    return df.select(F.col(value_col).cast("string").alias(out_col), F.col(ts_col))


#: Field name used to capture unparseable payloads inside the parsed struct.
CORRUPT_COL = "_corrupt_record"


def parse_json_events(
    df: DataFrame,
    json_col: str = "raw_json_data",
    schema: T.StructType = RIDE_SCHEMA,
    out_col: str = "data",
) -> DataFrame:
    """Parse the raw JSON string into a typed struct. ``from_json`` runs
    JVM-side inside whole-stage codegen — no Python in the hot path.

    PERMISSIVE mode: Spark yields an all-null struct (NOT a NULL struct) for
    malformed payloads, so the reference's ``data IS NOT NULL`` filter
    (02_silver:48) silently keeps garbage rows. We track corruption
    explicitly via ``columnNameOfCorruptRecord`` so ``drop_malformed`` is
    exact.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    return df.withColumn(
        out_col,
        F.from_json(F.col(json_col), full, {"columnNameOfCorruptRecord": CORRUPT_COL}),
    )


def drop_malformed(df: DataFrame, struct_col: str = "data") -> DataFrame:
    """Drop rows whose JSON failed to parse (NULL struct, or corrupt-record
    marker set by ``parse_json_events``)."""
    pred = F.col(struct_col).isNotNull()
    if CORRUPT_COL in df.schema[struct_col].dataType.fieldNames():
        pred = pred & F.col(f"{struct_col}.{CORRUPT_COL}").isNull()
    return df.filter(pred)


def expand_struct(df: DataFrame, struct_col: str = "data", *keep: str) -> DataFrame:
    """Flatten the parsed struct to top-level columns (``SELECT data.*``),
    carrying through any extra columns named in ``keep``. The internal
    corrupt-record marker is not exposed."""
    out = df.select(f"{struct_col}.*", *keep)
    if CORRUPT_COL in out.columns:
        out = out.drop(CORRUPT_COL)
    return out
