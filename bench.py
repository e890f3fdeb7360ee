#!/usr/bin/env python
"""Benchmark harness — times every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q_...": sec, ...}, "sf": <float>}

Each query is forced end-to-end with the ``noop`` sink (full plan execution,
no driver collect — measures the engine, not result serialization). A warmup
query amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1).rstrip(".")) if m else -1.0


def main() -> None:
    from real_time_rides_data_pipeline_spark.session import get_spark
    from real_time_rides_data_pipeline_spark.queries import registry

    spark = get_spark(app_name="bench", cpus=CPUS)
    specs = registry()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warmup: JVM JIT + codegen + parquet footer caches.
    run(specs["q_window_hourly_agg"].fn(spark, SF_DIR))

    # min-of-2: the local JVM shows rare multi-second scheduler/JIT stalls
    # on repeated single-task stages; min is the standard robust estimator.
    timings: dict[str, float] = {}
    for key in sorted(specs):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(specs[key].fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[key] = round(best, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_from_dir(SF_DIR)
    # Full per-key detail goes to BENCH.json; stdout gets ONE COMPACT line.
    # The round driver keeps only a ~4 KB tail of stdout — a line carrying all
    # ~100 keys exceeds that and fails to parse (BENCH_r01/r02: parsed null) —
    # so the printed "queries" dict is capped to the headline keys.
    with open(os.path.join(REPO_DIR, "BENCH.json"), "w") as f:
        json.dump(
            {
                "metric": "total_wall_clock_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": CPUS,
                "n_queries": len(timings),
            },
            f,
            indent=1,
            sort_keys=True,
        )
    headline = [
        "q_window_hourly_agg", "q_pipeline_e2e", "q_merge_upsert",
        "q_watermark", "q_stream_dedup", "q_output_complete",
        "q_stateful_running", "q_exact_dedup", "q_minhash_neardup",
        "q_simhash_neardup", "q_embed_neardup", "q_cosine_topk", "q_ann_ivf",
        "q_text_stats", "q_quality_score", "q_lang_id", "q_token_count",
        "q_multimodal_meta", "q_frame_sample", "q_join_inner",
        "q_join_multiway", "q_topn", "q_row_number", "q_sessionize",
        "q_tpch_q1", "q_tpch_q3", "q_tpch_q9", "q_tpch_q18", "q_tpch_q21",
    ]
    print(
        json.dumps(
            {
                "metric": "total_wall_clock_all_queries",
                "value": total,
                "unit": "sec",
                "queries": {k: timings[k] for k in headline if k in timings},
                "sf": sf,
                "n_queries": len(timings),
                "detail": "BENCH.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
