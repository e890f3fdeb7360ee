"""Area-growing scale probe for q_grid_join_radius.

The standing key-offset probe (scripts/scale_probe.py) is the WRONG
instrument for a fixed-radius spatial join: replicating keys grows point
DENSITY inside the same 1009x1013 area, so the true pair count — the
operator's output — is quadratic in the factor by construction, and wall
clock must track it. The honest 100 TB scenario is MORE AREA at constant
density (more cities, more days of telemetry), under which both the
output and the work of the grid join grow linearly.

This probe replicates the base point cloud with COORDINATE offsets:
replica r tiles the plane at (r % g, r div g) on a g x g grid of
1009x1013-sized tiles (g = ceil(sqrt(factor))), ids offset so pairs stay
canonical. Density is constant everywhere; tile seams behave exactly like
interior cell borders because the grid join is global over (cx, cy).

Usage: python scripts/grid_area_probe.py [factors...]   (default: 1 8 64)
Prints one JSON line per factor (min-of-2, noop sink — bench protocol)
and a summary slope_ratio = (t_hi/t_mid)/(hi/mid); ~1.0 = linear in area.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 8, 64]
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from real_time_rides_data_pipeline_spark.queries_ml import (
        _KNUTH,
        _grid_radius_pairs,
    )
    from real_time_rides_data_pipeline_spark.registry import _t
    from real_time_rides_data_pipeline_spark.session import get_spark

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="grid_area_probe",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
    )

    def pts_at(factor: int):
        o = _t(spark, src, "orders")
        base = o.filter(F.col("o_orderkey") % 23 == 0).select(
            F.col("o_orderkey").alias("pid"),
            (F.pmod(F.col("o_orderkey"), 1009) * F.lit(_KNUTH % 1009) % 1009)
            .alias("x"),
            (F.pmod(F.col("o_custkey"), 1013) * F.lit(_KNUTH % 1013) % 1013)
            .alias("y"),
        )
        if factor == 1:
            return base
        g = 1
        while g * g < factor:
            g += 1
        r = (
            spark.range(factor).withColumnRenamed("id", "__r")
            .hint("broadcast")
        )
        # Constant-density tiling: replica r lands in tile
        # (r % g, r div g); ids offset into disjoint bands.
        return base.crossJoin(r).select(
            (F.col("pid") + F.col("__r") * 100_000_000).alias("pid"),
            (F.col("x") + F.pmod(F.col("__r"), F.lit(g)) * 1009).alias("x"),
            (F.col("y") + (F.col("__r") - F.pmod(F.col("__r"), F.lit(g)))
             / F.lit(g) * 1013).cast("long").alias("y"),
        )

    results: dict[int, float] = {}
    pair_counts: dict[int, int] = {}
    for factor in factors:
        pts = pts_at(factor).localCheckpoint()  # pay replication ONCE,
        # outside the timed region — the probe measures the join, not the
        # synthetic tiling cross-join.
        best = None
        for _ in range(2):
            t0 = time.time()
            _grid_radius_pairs(pts).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        pair_counts[factor] = _grid_radius_pairs(pts).count()
        pts.unpersist()
        results[factor] = round(best, 3)
        print(
            json.dumps(
                {
                    "factor": factor,
                    "sec": results[factor],
                    "pairs": pair_counts[factor],
                }
            ),
            flush=True,
        )
    if len(factors) >= 3:
        lo, mid, hi = factors[0], factors[-2], factors[-1]
        print(
            json.dumps(
                {
                    "slope_ratio": round(
                        (results[hi] / results[mid]) / (hi / mid), 2
                    ),
                    "pairs_ratio": round(
                        (pair_counts[hi] / max(pair_counts[mid], 1))
                        / (hi / mid),
                        2,
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
