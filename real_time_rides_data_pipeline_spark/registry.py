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
    """All registered queries in registration order (importing the query
    modules as a side effect). The ordering here is the stable public one;
    driver-verification priority is a separate concern — see
    ``check_priority``/``ordered_registry``, applied only at the
    ``__spark_entry__`` boundary."""
    import real_time_rides_data_pipeline_spark.queries  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_ext  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_olap  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_tpch  # noqa: F401

    return dict(_REGISTRY)


def check_priority() -> tuple[str, ...]:
    """Driver-verification priority: the round driver oracle-checks only the
    FIRST 50 keys of ``__spark_entry__.queries()``, so keys whose code or
    oracle changed this round — plus keys whose last driver check predates a
    semantics-affecting engine change — are listed first. Rounds 1-3
    together covered all registered keys at least once (CORRECTNESS_r01-r03);
    round 4 priority = (a) the four list/map keys made hashable this round +
    the new/changed-oracle keys, then (b) the r2-window keys that were
    rotated out BEFORE the inferTimestampNTZ read-semantics change landed,
    so they get re-verified under the new timestamp semantics. Keys not
    listed keep registration order afterwards."""
    return (
        # (a) changed this round: list/map outputs serialized, scalar
        # percentiles, new audio key, byte-length oracles, bounded-mod hashes,
        # salted-join scalar-type filter
        "q_array_agg", "q_map_funcs", "q_array_funcs", "q_approx_quantile",
        "q_audio_meta", "q_top2_per_key", "q_multimodal_meta", "q_resize_meta",
        "q_hash_sample", "q_rand_column", "q_salted_join",
        # (b) r2-window keys, driver-unverified since the NTZ change
        # (q_cast_project/q_json_parse were re-greened in r3 — not repeated;
        # q_frame_sample/q_exact_dedup/q_simhash_neardup/q_ann_ivf/
        # q_text_stats/q_agg_cube — timestamp-free keys, r2-green — yield
        # their slots to the new q_top2_per_key / q_stream_dim_join /
        # q_partition_pruned_scan / q_stream_stream_join /
        # q_grouped_normalize / q_dup_clusters keys)
        "q_malformed_filter", "q_struct_star", "q_derived_duration",
        "q_validity_filter", "q_bool_enrich", "q_point_lookup",
        "q_window_hourly_agg", "q_agg_count", "q_agg_avg_round",
        "q_agg_cond_sum", "q_reagg_distinct", "q_count_all",
        "q_gold_point_lookup", "q_topn", "q_row_number", "q_join_inner",
        "q_join_left", "q_join_semi", "q_join_anti", "q_join_multiway",
        "q_agg_stats", "q_approx_distinct", "q_pipeline_e2e",
        "q_json_extract", "q_asof_latest", "q_stream_dim_join",
        "q_partition_pruned_scan", "q_stream_stream_join",
        "q_grouped_normalize", "q_minhash_neardup",
        "q_embed_neardup", "q_window_sliding",
        "q_window_session", "q_set_ops", "q_dup_clusters", "q_pivot",
        "q_tpch_q1", "q_merge_upsert", "q_stateful_running",
    )


def ordered_registry() -> dict[str, QuerySpec]:
    """Registry with ``check_priority`` keys first — the ordering the
    ``__spark_entry__`` driver contract exposes."""
    reg = registry()
    front = {k: reg[k] for k in check_priority() if k in reg}
    rest = {k: v for k, v in reg.items() if k not in front}
    return {**front, **rest}


def _t(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
) -> DataFrame:
    """Load a fixture table; ``parallel=True`` guards CPU-heavy downstream
    stages (JSON parse, hashing, shingling) against single-partition
    tiny-file scans (plans.shape.ensure_parallelism — no-op at real scale)."""
    df = load_fixture(spark, name, sf_dir)
    return ensure_parallelism(df) if parallel else df
