"""Targeted A/B timer: min-of-N for a few keys against an alternate repo
checkout (VERDICT r11 item 1 — attribute driver-bench movements to code or
host).

Usage: python scripts/ab_keys.py <repo_dir> <comma_keys> [reps]
Runs each key ``reps`` times in interleaved passes (pass = each key once)
inside ONE session built from <repo_dir>'s code, via the same noop-sink +
unpersist protocol as bench.py, and prints one JSON line of min/all timings.
Process-level interleave (caller alternates checkouts) cancels sustained
host stalls the same way bench.py's two passes do.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    keys = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sys.path.insert(0, repo)

    from real_time_rides_data_pipeline_spark.session import get_spark
    from real_time_rides_data_pipeline_spark.queries import registry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="ab_keys", cpus=cpus)
    specs = registry()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()
        jm = spark.sparkContext._jsc.getPersistentRDDs()
        if jm.size():
            it = jm.entrySet().iterator()
            while it.hasNext():
                it.next().getValue().unpersist(False)

    run(specs["q_window_hourly_agg"].fn(spark, sf_dir))  # warmup
    passes: dict[str, list[float]] = {k: [] for k in keys}
    for _ in range(reps):
        for key in keys:
            t0 = time.perf_counter()
            run(specs[key].fn(spark, sf_dir))
            passes[key].append(round(time.perf_counter() - t0, 4))
    print(json.dumps({
        "repo": repo,
        "min": {k: min(v) for k, v in passes.items()},
        "all": passes,
    }))


if __name__ == "__main__":
    main()
