#!/usr/bin/env python
"""In-process interleaved A/B of graph._ROUNDS_PER_SYNC (1 vs 2).

Materializes each pair graph once, then alternates _cc_star runs with
batch=1 and batch=2 on the SAME checkpointed edges — host stalls hit
both variants equally within an alternation, and min-of-N per variant
cancels the rest.
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

    from real_time_rides_data_pipeline_spark.operators import graph
    from real_time_rides_data_pipeline_spark.operators import similarity as SIM
    from real_time_rides_data_pipeline_spark.queries_ext import (
        _fitted_centroids,
        _minhash_verified_pairs,
        _t,
    )
    from real_time_rides_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="cc_batch_ab", cpus=CPUS)

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
    for rep in range(REPS):
        for batch in (1, 2):
            graph._ROUNDS_PER_SYNC = batch
            for name, edges in (("sd", sd_edges), ("mh", mh_edges)):
                t0 = time.perf_counter()
                labels = graph._cc_star(edges, 25, assume_distinct=True)
                labels.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                times.setdefault((name, batch), []).append(dt)
                print(f"rep{rep} batch={batch} {name}: {dt:6.2f} s", flush=True)
    print("\nmins:")
    for (name, batch), v in sorted(times.items()):
        print(f"{name} batch={batch}: {min(v):6.2f} s  (all {[round(x,2) for x in v]})")
    spark.stop()


if __name__ == "__main__":
    main()
