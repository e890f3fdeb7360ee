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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
