"""Declarative data-quality expectations (Delta Live Tables-style).

The reference hard-codes one validity predicate chain
(/root/reference/src/02_silver_realtime_rides.py:71-79); this operator
generalizes it: callers declare named boolean expectations, get back the
retained frame plus a per-expectation pass/fail stats frame — the audit
artifact every managed pipeline publishes alongside its tables.

Scale: both outputs are single-pass. The stats frame is ONE aggregate over
the scan (sums of CASE WHEN, partial+final, no per-expectation rescan) and
the retained frame is a plain conjunctive filter that pushes down like any
other predicate. At 100 TB the stats cost is the same one pass the write
was already making.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def retain(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """Rows satisfying EVERY expectation (the DLT ``expect_or_drop`` mode)."""
    cond = F.lit(True)
    for c in expectations.values():
        cond = cond & c
    return df.filter(cond)


def violations(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """Rows failing at least one expectation (the quarantine stream)."""
    cond = F.lit(False)
    for c in expectations.values():
        # NULL predicate result counts as a violation (same as retain:
        # NULL never satisfies the conjunctive filter)
        cond = cond | ~F.coalesce(c, F.lit(False))
    return df.filter(cond)


def expectation_stats(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """One row per expectation: (expectation, n_pass, n_fail), n_pass+n_fail
    = row count. Single aggregate pass, then a stack() unpivot of the one
    result row — the unpivot touches E*1 values, not data."""
    import re

    if not expectations:
        # stack(0, ) is a confusing runtime SQL parse error; fail clearly
        raise ValueError("expectations must be non-empty")
    for name in expectations:
        # names are spliced into a selectExpr stack() literal — restrict to
        # identifier characters so a quote can neither break nor inject SQL
        if not re.fullmatch(r"[A-Za-z0-9_]+", name):
            raise ValueError(
                f"expectation name {name!r} must match [A-Za-z0-9_]+"
            )
    aggs = []
    for name, cond in expectations.items():
        ok = F.coalesce(cond, F.lit(False))
        aggs.append(F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias(f"p_{name}"))
        aggs.append(F.sum(F.when(ok, 0).otherwise(1)).cast("long").alias(f"f_{name}"))
    wide = df.agg(*aggs)
    pairs = ", ".join(
        f"'{name}', p_{name}, f_{name}" for name in expectations
    )
    return wide.selectExpr(
        f"stack({len(expectations)}, {pairs}) AS (expectation, n_pass, n_fail)"
    )
