#!/usr/bin/env python
"""Targeted oracle check: run KEYS (comma list, argv[1]) against their
DuckDB oracles at sf_dir (argv[2], default sf0.01) through the same
comparator the test harness uses, in a fresh vanilla-session process (the
driver-faithful recipe). Keys without an oracle run a rows-only count.
Exit non-zero on any mismatch."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from real_time_rides_data_pipeline_spark.queries import registry
    from tests.oracle_harness import compare

    keys = sys.argv[1].split(",")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = 0
    for key in keys:
        spec = specs[key]
        df = spec.fn(spark, sf)
        if spec.oracle is None:
            n = df.count()
            print(f"{key}: rows-only, {n} rows")
            continue
        problems = compare(df, con, spec.oracle, key)
        if problems:
            bad += 1
            print(f"{key}: MISMATCH")
            for p in problems:
                print("   ", p)
        else:
            print(f"{key}: MATCH")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
