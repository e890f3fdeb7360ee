"""DuckDB-oracle golden tests — every registered key with an oracle must
hash-match at sf0.01 (the driver's t2 gate), and every key must run and
return a stable schema at sf0.001 (the t1 smoke)."""

from __future__ import annotations

import pytest

from real_time_rides_data_pipeline_spark.queries import registry

from tests.oracle_harness import compare
from tests.conftest import ORACLE_SF, SMOKE_SF

SPECS = registry()


@pytest.mark.parametrize("key", sorted(SPECS))
def test_smoke_runs(spark, key):
    df = SPECS[key].fn(spark, SMOKE_SF)
    assert df.columns, f"{key} produced no columns"
    # the driver canonicalizer sorts columns BY NAME before hashing —
    # duplicate names would silently corrupt the comparison
    assert len(set(df.columns)) == len(df.columns), df.columns
    df.limit(5).collect()  # plan executes


@pytest.mark.parametrize(
    "key", sorted(k for k, s in SPECS.items() if s.oracle is not None)
)
def test_oracle_match(spark, duck, key):
    spec = SPECS[key]
    df = spec.fn(spark, ORACLE_SF)
    con = duck(ORACLE_SF)
    problems = compare(df, con, spec.oracle, key)
    assert not problems, "\n".join(problems)


def test_harness_catches_hugeint_widening(spark, duck):
    """Regression for the round-5 driver hash-fails: a DuckDB oracle whose
    outer ``sum(BIGINT)`` widens to HUGEINT (Arrow decimal128) while Spark
    emits int64 must FAIL the local harness — the old ``Decimal→float``
    canonicalization masked exactly this (VERDICT.md r5, items 1-2)."""
    from pyspark.sql import functions as F

    con = duck(ORACLE_SF)
    ev = spark.read.parquet(f"{ORACLE_SF}/events.parquet")
    df = ev.groupBy("event_type").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents")
    )
    uncast = (
        "SELECT event_type, sum(CAST(round(value * 100) AS BIGINT)) "
        "AS total_cents FROM events GROUP BY event_type"
    )
    problems = compare(df, con, uncast, "widening_repro")
    assert problems and "decimal128" in problems[0], problems
    cast = (
        "SELECT event_type, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
        "AS total_cents FROM events GROUP BY event_type"
    )
    assert not compare(df, con, cast, "widening_fixed")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
