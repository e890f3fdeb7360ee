#!/usr/bin/env python
"""In-process interleaved A/B: allow shuffled-hash join vs prefer
sort-merge (guide §3.1; round-16 VERDICT item 4).

Leg "shj":  spark.sql.join.preferSortMergeJoin=false +
            spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=128m
            (sized to the partition advisory bound).
Leg "smj":  the defaults (preferSortMergeJoin=true, threshold 0).

Keys = every registered query whose round-15 static plan contains a
SortMergeJoin. Confs are set on the session per leg — both legs pay the
same plan-cache invalidation, and alternation cancels host drift.
"""

from __future__ import annotations

import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
REPS = int(os.environ.get("REPS", 3))
KEYS = os.environ.get(
    "KEYS",
    "q_pagerank,q_bleu_rouge,q_triangle_count,q_confusion_matrix,"
    "q_dup_clusters,q_ivm_agg_delta,q_join_full,q_minhash_cc_clusters,"
    "q_retrieval_mrr,q_semdedup,q_snapshot_diff",
).split(",")


def main() -> None:
    from real_time_rides_data_pipeline_spark.queries import registry
    from real_time_rides_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ab_shj", cpus=CPUS)
    sc = spark.sparkContext
    specs = registry()

    def unpersist_all():
        jm = sc._jsc.getPersistentRDDs()
        if jm.size():
            it = jm.entrySet().iterator()
            while it.hasNext():
                it.next().getValue().unpersist(False)

    def set_leg(shj: bool):
        spark.conf.set(
            "spark.sql.join.preferSortMergeJoin", "false" if shj else "true"
        )
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(128 * 1024 * 1024) if shj else "0",
        )

    specs["q_window_hourly_agg"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    unpersist_all()

    times: dict[tuple[str, str], list[float]] = {}
    for rep in range(REPS):
        for leg in ("smj", "shj"):
            set_leg(leg == "shj")
            for key in KEYS:
                sc.setJobDescription(f"{key}[{leg}]")
                t0 = time.perf_counter()
                specs[key].fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                unpersist_all()
                times.setdefault((key, leg), []).append(dt)
                print(f"rep{rep} {leg} {key}: {dt:6.2f} s", flush=True)
    set_leg(False)
    print("\nmins:")
    tot = {"smj": 0.0, "shj": 0.0}
    for (key, leg), v in sorted(times.items()):
        tot[leg] += min(v)
        print(
            f"{key:28s} {leg}: {min(v):6.2f} s  (all {[round(x, 2) for x in v]})"
        )
    print(f"\ntotals (sum of mins): smj {tot['smj']:.2f}  shj {tot['shj']:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
