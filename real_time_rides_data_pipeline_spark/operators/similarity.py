"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and IVF-bucketed ANN (the scale path). SURVEY.md §2.9.

Scale design: brute force is one scan + TakeOrderedAndProject (per-partition
heap, no global sort) — right answer for one-off queries. For repeated
queries at 100 TB, IVF partition-prunes: vectors are assigned to their
nearest centroid at write time (cluster_id becomes a partition column), and
a probe only scans the ``n_probe`` closest clusters — the classic
inverted-file trade of recall for scan fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_rides_data_pipeline_spark.functions.vectors import (
    as_double,
    cosine_rounded,
)


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector. The query vector is
    folded into the plan as an array literal (broadcast-free); ORDER BY+LIMIT
    plans TakeOrderedAndProject. Ties broken by id for determinism."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_rounded(as_double(F.col(vec_col)), q).alias("cosine_sim")
    return (
        vectors.select(F.col(id_col), sim)
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def assign_ivf_cluster(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid. Centroids are plan
    literals: at real scale they come from a sampled k-means fit, then this
    column becomes the partition key of the written table.

    The argmax is ``array_position(sims, array_max(sims))`` over an array of
    the K similarities — each similarity is evaluated exactly once. (A
    chained ``when(sim_i > best, …)`` fold re-references every prior sim in
    both branches, and the expression tree grows exponentially in K — the
    first version was ~50× slower purely from codegen size.) Ties pick the
    lowest centroid id (array_position returns the first match)."""
    v = as_double(F.col(vec_col))
    sims = F.array(
        *[
            cosine_rounded(v, F.array(*[F.lit(float(x)) for x in c]), 9)
            for c in centroids
        ]
    )
    return vectors.withColumn("__sims", sims).withColumn(
        out_col,
        (F.array_position(F.col("__sims"), F.array_max(F.col("__sims"))) - 1).cast(
            "int"
        ),
    ).drop("__sims")


def ivf_topk(
    vectors: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: score centroids against the query driver-side (tiny, pure
    Python arithmetic), scan only the ``n_probe`` best clusters, exact top-k
    within them. Recall < 1 by construction; scan fraction ≈ n_probe/K."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    ranked = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], query_vec))
    probe = ranked[:n_probe]
    assigned = assign_ivf_cluster(vectors, centroids, vec_col)
    pruned = assigned.filter(F.col("cluster_id").isin(probe))
    return brute_force_topk(pruned, query_vec, k, id_col, vec_col)


def cosine_pairs_above(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold (embedding near-dup). Self-join with
    id_a < id_b; at 100 TB wrap with an LSH/IVF candidate filter first —
    the exact pass below is the verification stage of that pipeline."""
    lhs = vectors.select(
        F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va")
    )
    rhs = vectors.select(
        F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb")
    )
    return (
        lhs.join(rhs, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", cosine_rounded(F.col("va"), F.col("vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
