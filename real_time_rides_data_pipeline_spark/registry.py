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
    import real_time_rides_data_pipeline_spark.queries_olap  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_ops  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_scale  # noqa: F401
    import real_time_rides_data_pipeline_spark.queries_tpch  # noqa: F401

    return dict(_REGISTRY)


def check_priority() -> tuple[str, ...]:
    """Driver-verification priority: the round driver oracle-checks only the
    FIRST 50 keys of ``__spark_entry__.queries()``. Board state entering
    round 7 (CORRECTNESS_r01-r06 union): all 164 keys checked at least
    once; staleness 50@r6 / 43@r5 / 47@r4 / 24@r3; one hash-fail
    (q_decimal_money — Arrow decimal-precision representation, re-fixed
    this round to compare exact integer cents) and one key whose operator
    had a latent bug (q_bloom_decontaminate — might_contain's int32
    array-literal inference, fixed). Round 7 priority = (a) the two
    re-fixed keys — these MUST re-check green, (b) four keys upgraded
    this round from rows-only to value-checked oracles (sketch keys now
    emit the exact answer cross-checked against DuckDB plus a Spark-side
    error-bound attestation; q_frame_sample gained a full byte-math
    oracle), (b2) the twenty never-checked keys registered this round
    (queries_ops.py plus the MinHash-attestation / Gopher-rules / RRF /
    Pareto / span-dedup / KS-drift additions — never-checked outranks
    stale greens), (c) the 24 r3-stale keys — after this window no key's
    latest check is older than r4 (2+4+20+24 = 50 head slots exactly),
    (e) the never-checked keys past the window (q_charlm_coverage,
    q_semdedup, q_url_canon_dedup, q_event_transitions,
    q_gapfill_interp, q_span_novelty, and the round-7-continuation
    queries_analytics.py six: q_fk_orphans, q_interval_overlap_join,
    q_decayed_sum, q_pagerank, q_bpe_pairs, q_null_impute — all locally
    oracle-green) plus the r4-stale cohort roll to round 8 as the first
    entries past it. Keys not listed keep registration order
    afterwards."""
    return (
        # (a) re-fixed this round, must re-check green
        "q_decimal_money", "q_bloom_decontaminate",
        # (b) rows-only → value-checked oracle upgrades (round 7)
        "q_approx_distinct", "q_approx_quantile", "q_hll_shard_merge",
        "q_frame_sample",
        # (b2) new in round 7, never driver-checked
        "q_join_full", "q_jaccard_join_exact", "q_time_weighted_avg",
        "q_compaction_plan", "q_observed_metrics", "q_python_udtf",
        "q_sql_params", "q_triangle_count", "q_winsorized_mean",
        "q_recursive_cte", "q_pipe_sql", "q_xml_parse", "q_curation_e2e",
        "q_asof_tolerance", "q_minhash_est_jaccard", "q_gopher_rules",
        "q_rrf_fusion", "q_pareto_frontier", "q_dup_spans", "q_ks_drift",
        # (c) latest driver check = round 3, registration order
        "q_percentile_disc", "q_window_range_frame", "q_ntile_first_last",
        "q_conditional_funcs", "q_bucketed_join", "q_tpch_q4", "q_tpch_q14",
        "q_unpivot", "q_asof_join", "q_range_join", "q_tpch_q5",
        "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10", "q_tpch_q13",
        "q_tpch_q15", "q_tpch_q16", "q_tpch_q17", "q_tpch_q18",
        "q_tpch_q19", "q_tpch_q20", "q_tpch_q21", "q_tpch_q22",
        # (e) first past the 50-key window — rolls to round 8
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
        "q_malformed_filter", "q_struct_star",
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
