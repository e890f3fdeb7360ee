"""Batch join operators (SURVEY.md §2.3 extensions).

The reference has no table-table joins (its only join-like op is the Delta
MERGE, operators/merge.py); these make the engine a credible analytics layer
over star-schema data.

Scale strategy: dimensions (region/nation, and customer at most SFs) go
broadcast — no shuffle of the fact side; fact⋈fact (lineitem⋈orders) is a
sort-merge/shuffled-hash join on the key, which AQE converts or skew-splits at
runtime. At 100 TB, pre-bucketing both facts on the join key removes the
shuffle entirely (see sinks.py bucketed writer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Rough row-count threshold under which we force a broadcast hint. Spark's
#: autoBroadcastJoinThreshold is byte-based; a hint is deterministic.
BROADCAST_HINT_MAX_ROWS = 10_000_000


def join_fact_dim(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact⋈dimension equi-join, broadcasting the dim side by default.

    Broadcast replicates the dim to every executor — zero shuffle of the
    (huge) fact side; correct call whenever the dim fits in executor memory.
    """
    dim_side = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(dim_side, on, how)


def semi_join(fact: DataFrame, other: DataFrame, on) -> DataFrame:
    """EXISTS filtering (left_semi): keeps fact columns only, never
    duplicates fact rows on multi-matches — cheaper than inner+distinct."""
    return fact.join(other, on, "left_semi")


def anti_join(fact: DataFrame, other: DataFrame, on) -> DataFrame:
    """NOT EXISTS filtering (left_anti)."""
    return fact.join(other, on, "left_anti")


def star_join(fact: DataFrame, dims: list[tuple[DataFrame, object]]) -> DataFrame:
    """Chain fact → dim1 → dim2 → …, broadcasting every dim. One scan of the
    fact, zero shuffles when all dims broadcast (the classic star-schema plan).
    """
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on, "inner")
    return out


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    salt_src: str | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side, replicate the dim side.

    A power-law key (one user produces 10% of all events) sends 10% of the
    shuffle to a single reducer. Salting splits each fact key into
    ``n_salts`` sub-keys — fact rows get ``salt = hash % n_salts`` (here a
    deterministic column-derived salt so replays/oracles are stable; use
    ``F.rand()`` when determinism doesn't matter), and the dim side is
    exploded ×``n_salts`` so every sub-key still finds its match. The join
    output is exactly the unsalted join; the shuffle is ``n_salts``×
    better balanced at the cost of a ``n_salts``× bigger (usually tiny) dim.

    Spark's AQE skew-join handles *sort-merge* skew automatically at
    runtime; explicit salting remains the tool for skewed *hash* shuffles,
    streaming state, and engines/configs where AQE can't see the skew.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_src or fact_key)), F.lit(n_salts)).cast("int")
    salted_fact = fact.withColumn("__salt", salt)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_fact.join(
        salted_dim,
        (F.col(fact_key) == F.col(dim_key)) & (salted_fact["__salt"] == salted_dim["__salt"]),
        "inner",
    )
    return joined.drop("__salt")
