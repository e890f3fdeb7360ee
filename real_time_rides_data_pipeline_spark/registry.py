"""Query registry plumbing shared by queries.py (core) and queries_ext.py
(LLM-data-pipeline extensions). Keys and semantics: SURVEY.md §2."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from real_time_rides_data_pipeline_spark.plans import ensure_parallelism
from real_time_rides_data_pipeline_spark.sources import load_fixture


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(key: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY[key] = QuerySpec(key, fn, oracle, doc)
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    """All registered queries (importing the query modules as a side effect)."""
    import real_time_rides_data_pipeline_spark.queries  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_ext  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_olap  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_tpch  # noqa: F401

    return dict(_REGISTRY)


def _t(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
) -> DataFrame:
    """Load a fixture table; ``parallel=True`` guards CPU-heavy downstream
    stages (JSON parse, hashing, shingling) against single-partition
    tiny-file scans (plans.shape.ensure_parallelism — no-op at real scale)."""
    df = load_fixture(spark, name, sf_dir)
    return ensure_parallelism(df) if parallel else df
