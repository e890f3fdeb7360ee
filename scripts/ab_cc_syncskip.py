#!/usr/bin/env python
"""In-process interleaved A/B of graph._FIRST_SYNC_ROUND (1 vs 2 vs 3).

Round-16 VERDICT item 2: each CC convergence-signature check is a driver
round-trip + an aggregate job; rounds before the first plausible fixpoint
can skip it (their lazy checkpoints materialize inside the first checked
round's cascade). Materializes each pair graph once, then alternates
_cc_star runs across _FIRST_SYNC_ROUND settings on the SAME checkpointed
edges; counts signature jobs per variant.
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
STARTS = [int(x) for x in os.environ.get("STARTS", "1,2,3").split(",")]


def main() -> None:
    from pyspark.sql import functions as F

    from real_time_rides_data_pipeline_spark.operators import graph
    from real_time_rides_data_pipeline_spark.operators import similarity as SIM
    from real_time_rides_data_pipeline_spark.queries_ext import (
        _fitted_centroids,
        _minhash_verified_pairs,
        _t,
    )
    from real_time_rides_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ab_cc_syncskip", cpus=CPUS)

    sig_calls = [0]
    orig_sig = graph._signature

    def counting_sig(e):
        sig_calls[0] += 1
        return orig_sig(e)

    graph._signature = counting_sig

    emb = _t(spark, SF_DIR, "embeddings", parallel=True)
    cents = _fitted_centroids(emb, SF_DIR)
    sd_edges = (
        SIM.cluster_pruned_pairs_above(emb, cents, 0.4)
        .select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .localCheckpoint(eager=True)
    )
    mh_edges = (
        _minhash_verified_pairs(spark, SF_DIR)
        .filter(F.col("is_dup"))
        .select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .localCheckpoint(eager=True)
    )
    print("sd edges:", sd_edges.count(), " mh edges:", mh_edges.count())

    times: dict[tuple[str, int], list[float]] = {}
    sigs: dict[tuple[str, int], int] = {}
    for rep in range(REPS):
        for start in STARTS:
            graph._FIRST_SYNC_ROUND = start
            for name, edges in (("sd", sd_edges), ("mh", mh_edges)):
                sig_calls[0] = 0
                t0 = time.perf_counter()
                labels = graph._cc_star(edges, 25, assume_distinct=True)
                labels.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                times.setdefault((name, start), []).append(dt)
                sigs[(name, start)] = sig_calls[0]
                print(
                    f"rep{rep} start={start} {name}: {dt:6.2f} s "
                    f"(sigs {sig_calls[0]})",
                    flush=True,
                )
    graph._FIRST_SYNC_ROUND = 1
    print("\nmins:")
    for (name, start), v in sorted(times.items()):
        print(
            f"{name} start={start}: {min(v):6.2f} s  sigs={sigs[(name, start)]}"
            f"  (all {[round(x, 2) for x in v]})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
