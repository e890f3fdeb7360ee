"""Sort/limit/top-k and ranking operators.

Reference: verify_gold_layer_data.py:10-12 (ORDER BY … LIMIT 100 — Spark plans
``TakeOrderedAndProject``: per-partition heap + driver merge, never a global
sort; this is the scalable top-k at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_n(df: DataFrame, order_by: list, n: int = 100) -> DataFrame:
    """Multi-key sort + limit → ``TakeOrderedAndProject`` (no full shuffle).
    ``order_by`` is a list of Columns (already .desc()/.asc())."""
    return df.orderBy(*order_by).limit(n)


def latest_per_key(
    df: DataFrame,
    keys: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """Latest record per key: ``row_number() OVER (PARTITION BY keys ORDER BY
    ts DESC[, tiebreak DESC]) = 1``. The deterministic batch twin of the
    streaming keep-latest-state operator (SURVEY.md §2.5 q_row_number /
    §2.9 q_asof_latest). One hash shuffle on the keys."""
    ordering = [F.col(ts_col).desc()]
    if tiebreak:
        ordering.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_group(
    df: DataFrame, keys: tuple[str, ...], order_by: list, k: int
) -> DataFrame:
    """Top-k within each group (rank ≤ k). Window shuffle on group keys only."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
