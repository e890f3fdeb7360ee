#!/usr/bin/env python
"""In-process interleaved A/B: q_bpe_train's 4-round argmax loop in the
parent session (current) vs a narrow session clone (the CC _loop_session
pattern — width 4, AQE off), VERDICT r16 item 6.

Variant B pays one extra count() to size the clone (the gate a real
implementation would need at scale), so the measured delta is the honest
end-to-end one.
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
REPS = int(os.environ.get("REPS", 4))


def main() -> None:
    from pyspark.sql import functions as F

    from real_time_rides_data_pipeline_spark.operators.bpe import (
        adjacent_pairs,
        chars_of,
        merge_pair,
        train_bpe,
    )
    from real_time_rides_data_pipeline_spark.operators.graph import (
        _loop_session,
    )
    from real_time_rides_data_pipeline_spark.queries_ext import _t
    from real_time_rides_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ab_bpe_clone", cpus=CPUS)
    sc = spark.sparkContext

    def unpersist_all():
        jm = sc._jsc.getPersistentRDDs()
        if jm.size():
            it = jm.entrySet().iterator()
            while it.hasNext():
                it.next().getValue().unpersist(False)

    def words_frame():
        d = _t(spark, SF_DIR, "documents", parallel=True)
        return (
            d.select(
                F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
            )
            .filter(F.length("word") > 0)
            .groupBy("word")
            .agg(F.count("*").alias("n"))
        )

    def current():
        words = words_frame()
        merges = train_bpe(words, n_merges=4)
        return spark.createDataFrame(
            merges,
            "step int, left string, right string, merged string, freq long",
        )

    def clone_variant():
        words = words_frame().localCheckpoint(eager=True)
        n_words = words.count()
        w, parent, rebind = _loop_session(words, n_words)
        seg = w.select(F.col("n"), chars_of("word").alias("seg"))
        merges = []
        for step in range(1, 5):
            best = (
                seg.select(
                    "n", F.explode(adjacent_pairs(F.col("seg"))).alias("p")
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("n").alias("freq"))
                .orderBy(
                    F.col("freq").desc(), F.col("l").asc(), F.col("r").asc()
                )
                .limit(1)
                .collect()
            )
            if not best:
                break
            l, r, freq = best[0]["l"], best[0]["r"], int(best[0]["freq"])
            merges.append((step, l, r, l + r, freq))
            seg = seg.select("n", merge_pair(F.col("seg"), l, r).alias("seg"))
        return spark.createDataFrame(
            merges,
            "step int, left string, right string, merged string, freq long",
        )

    # Warmup
    _t(spark, SF_DIR, "documents").count()

    ref = sorted(map(tuple, current().collect()))
    got = sorted(map(tuple, clone_variant().collect()))
    print("results equal:", ref == got)
    unpersist_all()

    times: dict[str, list[float]] = {}
    for rep in range(REPS):
        for variant, fn in (("parent", current), ("clone", clone_variant)):
            sc.setJobDescription(f"bpe_train[{variant}]")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            unpersist_all()
            times.setdefault(variant, []).append(dt)
            print(f"rep{rep} {variant:6s}: {dt:6.2f} s", flush=True)
    print("\nmins:")
    for variant, v in sorted(times.items()):
        print(f"{variant:6s}: {min(v):6.2f} s  (all {[round(x, 2) for x in v]})")
    spark.stop()


if __name__ == "__main__":
    main()
