#!/usr/bin/env python
"""In-process interleaved A/B: staging the shingle array as a projected
column (computed ONCE) vs the round-15 shape where the signature chain
and the verify-side `sh` column each evaluate word_shingles(text)
independently in the same projection.

Round-16 VERDICT item 3 (minhash family within-key dedup). Three probes:

  portable  — _minhash_verified_pairs' signature projection
              (md5-affine 16-hash family + sh column), to the checkpoint.
  xx64      — q_minhash_est_jaccard's 64-hash xxhash64 projection + sh.
  neardup   — minhash_near_duplicates end-to-end: r15 shape re-derives
              shingles from a second docs scan for the verify join; the
              staged shape carries sh through the signature checkpoint.

Each probe alternates current vs staged within one session (min-of-N).
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


def main() -> None:
    from pyspark.sql import functions as F

    from real_time_rides_data_pipeline_spark.functions.text import (
        md5_int60,
        word_shingles,
    )
    from real_time_rides_data_pipeline_spark.operators import textdedup as TD
    from real_time_rides_data_pipeline_spark.queries_ext import (
        _neardup_docs,
        _t,
    )
    from real_time_rides_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ab_minhash_shingle", cpus=CPUS)
    sc = spark.sparkContext

    def unpersist_all():
        jm = sc._jsc.getPersistentRDDs()
        if jm.size():
            it = jm.entrySet().iterator()
            while it.hasNext():
                it.next().getValue().unpersist(False)

    P = TD.MINHASH_P

    def portable_current():
        return TD.with_minhash_signature_portable(
            _neardup_docs(spark, SF_DIR)
        ).select(
            "doc_id", word_shingles(F.col("text"), 3).alias("sh"), "minhash"
        )

    def portable_staged():
        docs = _neardup_docs(spark, SF_DIR)
        staged = docs.select(
            "doc_id", word_shingles(F.col("text"), 3).alias("sh")
        ).withColumn(
            "_mh_base", F.transform(F.col("sh"), lambda s: md5_int60(s) % P)
        )

        def affine(a: int, b: int):
            return lambda h: (h * a + b) % P

        sig = F.array(
            *[
                F.array_min(F.transform(F.col("_mh_base"), affine(a, b)))
                for a, b in TD.MINHASH_AB
            ]
        )
        return staged.select("doc_id", "sh", sig.alias("minhash"))

    def xx64_current():
        d = _t(spark, SF_DIR, "documents", parallel=True).select(
            "doc_id", "text"
        )
        return TD.with_minhash_signature(
            d, "text", n_hashes=64, shingle_words=3
        ).select(
            "doc_id", word_shingles(F.col("text"), 3).alias("sh"), "minhash"
        )

    def xx64_staged():
        d = _t(spark, SF_DIR, "documents", parallel=True).select(
            "doc_id", "text"
        )
        staged = d.select(
            "doc_id", word_shingles(F.col("text"), 3).alias("sh")
        )
        sig = F.array(
            *[
                F.array_min(
                    F.transform(
                        F.col("sh"), lambda s, i=i: F.xxhash64(s, F.lit(i))
                    )
                )
                for i in range(64)
            ]
        )
        return staged.select("doc_id", "sh", sig.alias("minhash"))

    def neardup_current():
        return TD.minhash_near_duplicates(_neardup_docs(spark, SF_DIR)).orderBy(
            "id_a", "id_b"
        )

    def neardup_staged():
        docs = _neardup_docs(spark, SF_DIR)
        staged = docs.select(
            "doc_id", word_shingles(F.col("text"), 3).alias("__sh")
        )
        sig = F.array(
            *[
                F.array_min(
                    F.transform(
                        F.col("__sh"), lambda s, i=i: F.xxhash64(s, F.lit(i))
                    )
                )
                for i in range(16)
            ]
        )
        signed = staged.select(
            "doc_id", "__sh", sig.alias("minhash")
        ).localCheckpoint(eager=True)
        cands = TD.minhash_candidate_pairs(signed, "doc_id", "minhash", 4)
        sh = signed.select("doc_id", F.col("__sh").alias("sh"))
        j = (
            cands.join(
                sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                    "sh", "sh_a"
                ),
                "id_a",
            )
            .join(
                sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                    "sh", "sh_b"
                ),
                "id_b",
            )
            .withColumn(
                "jaccard",
                F.round(
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b")),
                    6,
                ),
            )
        )
        return (
            j.filter(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b", "jaccard")
            .orderBy("id_a", "id_b")
        )

    probes = {
        "portable": (portable_current, portable_staged),
        "xx64": (xx64_current, xx64_staged),
        "neardup": (neardup_current, neardup_staged),
    }

    # Warmup
    _t(spark, SF_DIR, "documents").count()

    times: dict[tuple[str, str], list[float]] = {}
    for rep in range(REPS):
        for name, (cur, stg) in probes.items():
            for variant, fn in (("current", cur), ("staged", stg)):
                sc.setJobDescription(f"{name}[{variant}]")
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                unpersist_all()
                times.setdefault((name, variant), []).append(dt)
                print(f"rep{rep} {name:9s} {variant:8s}: {dt:6.2f} s", flush=True)
    print("\nmins:")
    for (name, variant), v in sorted(times.items()):
        print(
            f"{name:9s} {variant:8s}: {min(v):6.2f} s  "
            f"(all {[round(x, 2) for x in v]})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
