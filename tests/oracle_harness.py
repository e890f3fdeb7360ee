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
    """Canonicalize a single value for cross-engine comparison.

    TYPE-STRICT (round-6 hardening): the driver's value hash is
    type-sensitive, so a DuckDB ``sum(BIGINT)`` that widens to HUGEINT
    (Arrow decimal128) must NOT compare equal to Spark's int64 here —
    round 5 shipped 7 driver hash-fails that the old ``Decimal→float``
    coercion masked locally (see VERDICT.md r5 §What's-wrong).  Numeric
    values therefore carry a type tag: int ≠ float ≠ Decimal even when
    numerically equal.  Decimals compare scale-insensitively WITHIN the
    decimal family (normalize()), matching the driver's value-level hash
    of Python Decimal objects.
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return ("decimal", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        # 12 significant digits absorbs float noise while catching real bugs
        return ("float", float(f"{v:.12g}"))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, datetime):
        # Do NOT strip tzinfo: a tz-aware oracle value must NOT compare equal
        # to Spark's tz-naive timestamp — the driver's Arrow schema check
        # fails on TIMESTAMPTZ, so the local harness must too.
        return v.isoformat(sep=" ", timespec="microseconds")
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


def duck_rows(con, sql: str) -> tuple[list[str], list[tuple], list[str]]:
    """Fetch oracle rows via Arrow (driver parity).

    Returns (sorted column names, canonicalized sorted rows, tz_cols) where
    ``tz_cols`` lists columns whose Arrow type is timestamp-with-timezone —
    the driver's schema compare runs on the Arrow schema, so any such column
    is an automatic ``schema_match: false`` and must fail locally too.
    """
    import pyarrow as pa

    tbl = con.execute(sql).arrow()
    tz_cols = [
        f.name
        for f in tbl.schema
        if pa.types.is_timestamp(f.type) and f.type.tz is not None
    ]
    dec_cols = [
        f.name
        for f in tbl.schema
        if pa.types.is_decimal(f.type)
    ]
    names = tbl.schema.names
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    pyrows = tbl.to_pylist()
    rows = [tuple(_canon(r[names[i]]) for i in order) for r in pyrows]
    return (
        cols,
        sorted(rows, key=lambda t: tuple(repr(x) for x in t)),
        tz_cols,
        dec_cols,
    )


def compare(df: DataFrame, con, sql: str, key: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    from pyspark.sql import types as T

    problems: list[str] = []
    scols, srows = spark_rows(df)
    dcols, drows, tz_cols, dec_cols = duck_rows(con, sql)
    if tz_cols:
        problems.append(
            f"[{key}] oracle columns are TIMESTAMPTZ (driver schema_match "
            f"would fail): {tz_cols} — CAST to plain TIMESTAMP in the SQL"
        )
        return problems
    # Integer-widening guard (the r5 failure mode): an oracle column whose
    # Arrow type is decimal128 — typically DuckDB sum(BIGINT)→HUGEINT —
    # while the Spark twin emits a non-decimal type fails the driver's
    # type-sensitive value hash.  Fail it here, with the fix named.
    spark_types = {f.name: f.dataType for f in df.schema.fields}
    for c in dec_cols:
        st = spark_types.get(c)
        if not isinstance(st, T.DecimalType):
            problems.append(
                f"[{key}] oracle column {c!r} is Arrow decimal128 (DuckDB "
                f"sum(BIGINT) widens to HUGEINT) but Spark emits "
                f"{st.simpleString() if st is not None else '<missing>'} — "
                f"wrap the oracle aggregate in CAST(... AS BIGINT)"
            )
    if problems:
        return problems
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
