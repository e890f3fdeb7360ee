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


# The round driver oracle-checks only the FIRST 50 keys of queries(), in dict
# order. Rounds 1-2 verified the original first-50 (see CORRECTNESS_r01/r02);
# this round the previously-unchecked tail is promoted to the front so driver
# verification accumulates across rounds. Keys absent from this list keep
# registration order after it.
_CHECK_FRONT: tuple[str, ...] = (
    # streaming trio (never driver-checked)
    "q_stream_dedup", "q_watermark", "q_output_complete",
    # OVER-window suite
    "q_rank", "q_lag_lead", "q_running_sum", "q_ntile_first_last",
    "q_window_range_frame", "q_max_by", "q_percentile_disc", "q_histogram",
    # grouped/relational extras
    "q_agg_rollup", "q_grouping_sets", "q_array_agg", "q_unpivot",
    "q_scalar_subquery", "q_sessionize", "q_approx_quantile",
    "q_conditional_funcs", "q_string_funcs", "q_date_funcs", "q_map_funcs",
    "q_array_funcs", "q_explode_tokens", "q_hash_sample", "q_resize_meta",
    # join strategies
    "q_salted_join", "q_bucketed_join", "q_asof_join", "q_range_join",
    # TPC-H kernels beyond Q1
    "q_tpch_q3", "q_tpch_q4", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7",
    "q_tpch_q8", "q_tpch_q9", "q_tpch_q10", "q_tpch_q13", "q_tpch_q14",
    "q_tpch_q15", "q_tpch_q16", "q_tpch_q17", "q_tpch_q18", "q_tpch_q19",
    "q_tpch_q20", "q_tpch_q21", "q_tpch_q22",
)


def registry() -> dict[str, QuerySpec]:
    """All registered queries (importing the query modules as a side effect)."""
    import real_time_rides_data_pipeline_spark.queries  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_ext  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_olap  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_tpch  # noqa: F401

    front = {k: _REGISTRY[k] for k in _CHECK_FRONT if k in _REGISTRY}
    rest = {k: v for k, v in _REGISTRY.items() if k not in front}
    return {**front, **rest}


def _t(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
) -> DataFrame:
    """Load a fixture table; ``parallel=True`` guards CPU-heavy downstream
    stages (JSON parse, hashing, shingling) against single-partition
    tiny-file scans (plans.shape.ensure_parallelism — no-op at real scale)."""
    df = load_fixture(spark, name, sf_dir)
    return ensure_parallelism(df) if parallel else df
