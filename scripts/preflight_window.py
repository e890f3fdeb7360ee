"""Driver-faithful pre-flight of the round's 50-key check window.

Replays exactly what the round driver will do: a FRESH VANILLA
SparkSession (no session-factory configs — the package must
self-configure), the first 50 keys of ``__spark_entry__.queries()``
(the computed check-priority order), each compared against its
``oracle_sql()`` leg through the harness comparator at sf0.01 (the
driver's t2 gate). Keys without an oracle run a rows-only count, the
same weaker check the driver records.

Run BEFORE the driver does, after any registration that changes the
window:  python scripts/preflight_window.py  [sf_dir]
Exit status is non-zero when any key fails.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from tests.oracle_harness import compare

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = e.queries(), e.oracle_sql()
    # PREFLIGHT_ALL=1 sweeps the ENTIRE registry driver-faithfully (the
    # round-close depth pass); default replays the driver's 50-key window.
    win = (
        list(qs)
        if os.environ.get("PREFLIGHT_ALL")
        else list(qs)[:50]
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    green = rows_only = fail = 0
    for k in win:
        t0 = time.time()
        try:
            df = qs[k](spark, sf)
            if k in osql:
                problems = compare(df, con, osql[k], k)
                if problems:
                    fail += 1
                    print(f"{k} FAIL {problems[:2]}", flush=True)
                else:
                    green += 1
                    print(f"{k} green {time.time() - t0:.1f}s", flush=True)
            else:
                n = df.count()
                rows_only += 1
                print(
                    f"{k} rows_only n={n} {time.time() - t0:.1f}s",
                    flush=True,
                )
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            fail += 1
            print(f"{k} ERR {repr(ex)[:300]}", flush=True)
    print(
        f"SUMMARY green={green} rows_only={rows_only} fail={fail}",
        flush=True,
    )
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
