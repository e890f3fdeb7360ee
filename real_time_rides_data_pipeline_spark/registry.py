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
    import real_time_rides_data_pipeline_spark.queries_scale  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_tpch  # noqa: F401

    return dict(_REGISTRY)


def check_priority() -> tuple[str, ...]:
    """Driver-verification priority: the round driver oracle-checks only the
    FIRST 50 keys of ``__spark_entry__.queries()``. Board state entering
    round 6 (CORRECTNESS_r01-r05 union): 145/147 keys checked at least
    once; q_vocab_coverage / q_quality_topfrac registered after the r5
    window filled (never checked); 7 r5-checked keys FAILED hash with the
    DuckDB HUGEINT-widening oracle bug, fixed this round (outer sums now
    CAST(... AS BIGINT); q_decimal_money aligned to DECIMAL(28,2));
    5 keys last checked r2, 43 last checked r3. Round 6 priority =
    (a) the two never-checked keys, (b) the seven re-fixed oracles —
    these MUST re-check green this round, (c) the 17 keys newly
    registered in round 6, (d) the r2-stale cohort, (e) the r3-stale
    cohort in registration order (2+7+17+5 = 31 head slots leave 19 of
    the 43 for this window; the other 24 roll to round 7 — new keys
    outrank the stale rotation because a never-checked key has no driver
    row at all, while r3-stale keys hold green ones). Keys not listed
    keep registration order afterwards."""
    return (
        # (a) never driver-checked (registered after the r5 window filled)
        "q_vocab_coverage", "q_quality_topfrac",
        # (b) the seven r5 hash-fails, oracles re-fixed this round
        "q_decimal_money", "q_gapfill_spine", "q_rollup_reagg",
        "q_scd2_history", "q_skew_salted_agg", "q_sql_entry", "q_tpch_q11",
        # (c) new in round 6
        "q_bloom_decontaminate", "q_cdc_apply", "q_corpus_shard",
        "q_int8_quantize", "q_pmi_bigrams", "q_mad_outlier",
        "q_regex_pretokenize", "q_funnel_steps",
        "q_sql_udf", "q_profile_stats", "q_cdc_stream",
        "q_cohort_retention", "q_importance_sample",
        "q_listagg", "q_bitmap_distinct", "q_approx_topk", "q_corr_exact",
        # (d) latest driver check = round 2
        "q_doc_fingerprint", "q_lang_id", "q_ngram_jaccard",
        "q_quality_score", "q_token_count",
        # (e) latest driver check = round 3, registration order
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
