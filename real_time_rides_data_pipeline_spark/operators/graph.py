"""Connected components — the pair→cluster step of a dedup pipeline.

Near-dup detection (operators/textdedup.py, operators/similarity.py) emits
PAIRS; production dedup needs CLUSTERS: transitive closure over the pair
graph, then one representative elected per cluster (keep it, drop the
rest). The reference has no graph surface at all — this is part of the
LLM-data-pipeline extension mandate (SURVEY.md §2.9).

Scale notes (100 TB): min-label propagation converges in O(component
diameter) rounds — near-dup clusters are shallow (stars/short chains), so
a handful of rounds suffices; the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond") drops
that to O(log diameter) and is the documented upgrade path for adversarial
graphs. Each round is one hash-shuffle join on vertex ids. Lineage is
truncated per round with ``localCheckpoint`` (iterative plans otherwise
grow unboundedly), and the per-round convergence check collects a single
driver-side count — iteration control, not data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex with the MINIMUM vertex id reachable from it
    (undirected): output columns ``(id, component)``. Deterministic —
    the representative of each cluster is its smallest id.
    """
    # Materialize the symmetric edge list ONCE: it is re-read every round,
    # and without truncation the (possibly expensive) upstream
    # edge-generation DAG — shingling, candidate joins — would recompute
    # per iteration.
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionAll(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .localCheckpoint(eager=True)
    )
    all_ids = vertices.select(F.col(id_col).alias("id"))
    # Isolated vertices are trivially their own component — iterate only
    # over vertices that appear in an edge (typically a small fraction of a
    # dedup corpus) and union the rest back at the end.
    labels = (
        sym.select(F.col("u").alias("id")).distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        # One checkpointed pass carries (prev, new) so the convergence
        # check is a filter over the materialized rows, not another join.
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.col("component").alias("prev"),
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("component") < F.col("prev")).count()
        labels = updated.select("id", "component")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing): the graph has a component "
            "deeper than max_iter — raise max_iter or switch to "
            "large-star/small-star"
        )
    # Key the output to the DECLARED vertex set: ids appearing only in edges
    # are dropped, vertices untouched by any edge label themselves. (The
    # component label itself is just an identifier — it may be an edge-only
    # id if that id is the minimum of its component.)
    return all_ids.join(labels, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
