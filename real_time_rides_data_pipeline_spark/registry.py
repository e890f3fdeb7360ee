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
    import real_time_rides_data_pipeline_spark.queries_analytics  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_curate  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_ext  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_mining  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_ml  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_olap  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_ops  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_scale  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_tpch  # noqa: F401

    return dict(_REGISTRY)


def check_priority() -> tuple[str, ...]:
    """Driver-verification priority: the round driver oracle-checks only the
    FIRST 50 keys of ``__spark_entry__.queries()``. Board state entering
    round 8 (CORRECTNESS_r01-r07 union): 221 keys registered, 184 checked
    at least once, ALL 50 round-7 window keys fully green (including the
    two round-6 re-fixes q_decimal_money and q_bloom_decontaminate);
    staleness 50@r7 / 48@r6 / 41@r5 / 45@r4; 37 keys registered during
    round 7 have never been driver-checked (all locally oracle-green in
    the pytest harness at sf0.01). Round 8 priority = (a) the 37
    never-checked round-7 keys, in registration order — never-checked
    outranks stale greens, (b) the 13 oldest r4-stale keys (registration
    order), filling the window to exactly 50. The remaining 32 r4-stale
    keys roll past the window as the first entries of the round-9 cohort,
    followed by the r5-stale cohort. Keys not listed keep registration
    order afterwards. New round-8 registrations are appended to section (d)
    at the END of this tuple as they land so round 9 can promote them."""
    return (
        # (a) registered in round 7, never driver-checked
        "q_charlm_coverage", "q_semdedup", "q_url_canon_dedup",
        "q_event_transitions", "q_gapfill_interp", "q_span_novelty",
        "q_fk_orphans", "q_interval_overlap_join", "q_decayed_sum",
        "q_pagerank", "q_bpe_pairs", "q_null_impute", "q_stream_decayed",
        "q_attribution_lasttouch", "q_skew_report", "q_burst_detect",
        "q_embed_dimstats", "q_union_evolve", "q_snapshot_diff",
        "q_vocab_encode", "q_file_lineage", "q_degree_dist",
        "q_gini_impurity", "q_kanon_suppress", "q_bm25_topk",
        "q_cms_heavy_hitters", "q_cogroup_asof", "q_stream_session",
        "q_domain_cap", "q_join_cardinality_estimate", "q_quantile_bins",
        "q_chi2_cells", "q_stream_cms_merge", "q_keyset_pagination",
        "q_clamped_running_balance", "q_stream_late_metrics",
        "q_capped_balance_fold",
        # (b) oldest r4-stale keys — 13 slots fill the window to 50
        "q_malformed_filter", "q_struct_star", "q_derived_duration",
        "q_rand_column", "q_validity_filter", "q_bool_enrich",
        "q_point_lookup", "q_window_hourly_agg", "q_agg_count",
        "q_agg_avg_round", "q_agg_cond_sum", "q_reagg_distinct",
        "q_count_all",
        # (c) r4-stale remainder — rolls to round 9 past the 50-key window
        "q_gold_point_lookup", "q_topn", "q_row_number", "q_join_inner",
        "q_join_left", "q_join_semi", "q_join_anti", "q_join_multiway",
        "q_agg_stats", "q_pipeline_e2e", "q_json_extract", "q_asof_latest",
        "q_minhash_neardup", "q_multimodal_meta", "q_audio_meta",
        "q_window_sliding", "q_window_session", "q_set_ops", "q_pivot",
        "q_tpch_q1", "q_merge_upsert", "q_stateful_running",
        "q_stream_dim_join", "q_stream_stream_join", "q_top2_per_key",
        "q_array_agg", "q_salted_join", "q_partition_pruned_scan",
        "q_hash_sample", "q_map_funcs", "q_array_funcs", "q_resize_meta",
        # (d) registered in round 8 (queries_ml.py; q_ohlc_bars,
        # q_stream_ohlc, q_kafka_frame_parse, q_time_to_convert in
        # queries_analytics.py; q_csv_corrupt_records in queries_ops.py) —
        # never driver-checked; round 9 MUST promote these to the window
        # head.
        "q_linreg_fit", "q_auc_roc", "q_confusion_matrix", "q_score_lift",
        "q_rolling_median", "q_grid_join_radius", "q_feature_hash",
        "q_knn_classify", "q_pca_project", "q_target_encode",
        "q_calibration_bins", "q_retrieval_mrr", "q_ldiversity",
        "q_dedup_report", "q_bpe_train", "q_stream_linreg",
        "q_ohlc_bars", "q_rfm_segments", "q_stream_ohlc",
        "q_kafka_frame_parse", "q_time_to_convert",
        "q_csv_corrupt_records",
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
