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
    round 9 (CORRECTNESS_r01-r08 union): 243 keys registered, 221 checked
    at least once, ALL 50 round-8 window keys fully green; staleness
    50@r8 / 50@r7 / 48@r6 / 41@r5 / 32@r4; the 22 keys registered during
    round 8 have never been driver-checked (all locally oracle-green in
    the pytest harness at sf0.01). Round 9 priority = (a) the 22
    never-checked round-8 keys, in registration order — never-checked
    outranks stale greens, (b) the first 28 of the 32 r4-stale keys
    (registration order), filling the window to exactly 50. Section (c)
    holds the 4 r4-stale keys that roll past the window, then the 41
    r5-stale keys — together the head of the round-10 cohort. Keys not
    listed keep registration order afterwards. New round-9 registrations
    are appended to section (d) at the END of this tuple as they land so
    round 10 can promote them."""
    return (
        # (a) registered in round 8, never driver-checked
        "q_linreg_fit", "q_auc_roc", "q_confusion_matrix", "q_score_lift",
        "q_rolling_median", "q_grid_join_radius", "q_feature_hash",
        "q_knn_classify", "q_pca_project", "q_target_encode",
        "q_calibration_bins", "q_retrieval_mrr", "q_ldiversity",
        "q_dedup_report", "q_bpe_train", "q_stream_linreg",
        "q_ohlc_bars", "q_rfm_segments", "q_stream_ohlc",
        "q_kafka_frame_parse", "q_time_to_convert",
        "q_csv_corrupt_records",
        # (b) r4-stale keys, registration order — 28 slots fill the
        # window to exactly 50
        "q_gold_point_lookup", "q_topn", "q_row_number", "q_join_inner",
        "q_join_left", "q_join_semi", "q_join_anti", "q_join_multiway",
        "q_agg_stats", "q_pipeline_e2e", "q_json_extract", "q_asof_latest",
        "q_minhash_neardup", "q_multimodal_meta", "q_audio_meta",
        "q_window_sliding", "q_window_session", "q_set_ops", "q_pivot",
        "q_tpch_q1", "q_merge_upsert", "q_stateful_running",
        "q_stream_dim_join", "q_stream_stream_join", "q_top2_per_key",
        "q_array_agg", "q_salted_join", "q_partition_pruned_scan",
        # (c) rolls past the round-9 window: the 4 r4-stale remainder,
        # then the 41 r5-stale keys (driver-check order) — round-10 head
        "q_hash_sample", "q_map_funcs", "q_array_funcs", "q_resize_meta",
        "q_exact_dedup", "q_simhash_neardup", "q_cosine_topk",
        "q_embed_neardup", "q_ann_ivf", "q_text_stats", "q_agg_cube",
        "q_grouped_normalize", "q_dup_clusters", "q_repetition_score",
        "q_text_chunk", "q_tpch_q12", "q_stream_stream_join_outer",
        "q_tfidf_topk", "q_crypto_fingerprint", "q_pii_redact",
        "q_levenshtein_neardup", "q_stratified_sample", "q_percentile_cont",
        "q_lsh_hyperplane", "q_posexplode", "q_jsonl_roundtrip",
        "q_decontaminate", "q_dataset_mix", "q_orc_roundtrip",
        "q_csv_roundtrip", "q_tpch_q2", "q_variant_json", "q_lateral_topk",
        "q_url_extract", "q_sequence_pack", "q_dominant_token",
        "q_zscore_outlier", "q_arrow_bytes", "q_zorder_layout",
        "q_expectations", "q_paragraph_dedup", "q_incremental_dedup",
        "q_cume_dist_nth", "q_collated_group", "q_try_arithmetic",
        # (d) registered in round 9 — never driver-checked; round 10 MUST
        # promote these to the window head.
        "q_simhash_est_hamming", "q_ndcg_at10", "q_pr_auc",
        "q_brier_score", "q_cohens_kappa", "q_group_kfold",
        "q_tscv_splits", "q_scd2_intervals", "q_funnel_paths",
        "q_retention_cohorts", "q_kmv_theta_sketch", "q_stream_kmv",
        "q_acf_hourly", "q_benford_audit", "q_stream_leaderboard",
        "q_mcc", "q_cv_ols",
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
