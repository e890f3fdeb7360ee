"""Driver-parity comparator: Spark result vs DuckDB oracle.

Mimics the driver's CORRECTNESS check: row-count + schema-compatible columns +
order-insensitive value hash (columns sorted by name, rows sorted by their
full value tuple, values canonicalized). Used by tests BEFORE a key is
claimed in ``__spark_entry__.py``.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import DataFrame


def _canon(v):
    """Canonicalize a single value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits absorbs float noise while catching real bugs
        return float(f"{v:.12g}")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def spark_rows(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=lambda t: tuple(repr(x) for x in t))


def duck_rows(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(_canon(r[i]) for i in order) for r in cur.fetchall()]
    return cols, sorted(rows, key=lambda t: tuple(repr(x) for x in t))


def compare(df: DataFrame, con, sql: str, key: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    scols, srows = spark_rows(df)
    dcols, drows = duck_rows(con, sql)
    if scols != dcols:
        problems.append(f"[{key}] columns differ: spark={scols} duck={dcols}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"[{key}] row count: spark={len(srows)} duck={len(drows)}")
        return problems
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            problems.append(f"[{key}] first diff at sorted row {i}:\n  spark={a}\n  duck ={b}")
            break
    return problems
