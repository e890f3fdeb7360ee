"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hourly windowed aggregate on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented SURVEY.md §2 key with
its DuckDB oracle (None-oracle keys are omitted from ``oracle_sql`` → the
driver records a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

# ordered_registry puts this round's check-priority keys first (the round
# driver oracle-checks the first 50 queries() keys); the package-public
# registry() itself stays in stable registration order.
from real_time_rides_data_pipeline_spark.registry import ordered_registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from real_time_rides_data_pipeline_spark.queries import q_window_hourly_agg

    return q_window_hourly_agg(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {key: spec.fn for key, spec in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per key (omitted → rows-only check)."""
    return {
        key: spec.oracle
        for key, spec in ordered_registry().items()
        if spec.oracle is not None
    }
