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


def duck_rows(
    con, sql: str
) -> tuple[list[str], list[tuple], list[str], list[str]]:
    """Fetch oracle rows via Arrow (driver parity).

    Returns (sorted column names, canonicalized sorted rows, tz_cols,
    dec_cols).  ``tz_cols`` lists columns whose Arrow type is
    timestamp-with-timezone — the driver's schema compare runs on the Arrow
    schema, so any such column is an automatic ``schema_match: false`` and
    must fail locally too.  ``dec_cols`` lists columns whose Arrow type is
    decimal128 (e.g. DuckDB sum(BIGINT) widening to HUGEINT, or an explicit
    DECIMAL cast) — a driver hash hazard, see ``compare``.
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
    # Comparator-sortability guard (the r10 q_inverted_index failure
    # mode): the DRIVER canonicalizes via pandas sort_values over all
    # columns, which crashes on list/map-typed cells (`TypeError:
    # unhashable type: 'list'`) even though this harness's tuple-based
    # canonicalizer handles them fine.  Any Array/Map output column is
    # therefore an automatic driver `err` — flag it here so the sf0.01
    # pre-flight catches what the value compare would mask.  Serialize
    # to STRING on both legs instead (array_join / to_json vs
    # string_agg / to_json) — see q_inverted_index, q_array_agg.
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType)):
            problems.append(
                f"[{key}] Spark column {f.name!r} is "
                f"{f.dataType.simpleString()} — the driver comparator "
                f"cannot sort list/map cells (pandas sort_values "
                f"TypeError); serialize to STRING on both legs"
            )
    if problems:
        return problems
    scols, srows = spark_rows(df)
    dcols, drows, tz_cols, dec_cols = duck_rows(con, sql)
    if tz_cols:
        problems.append(
            f"[{key}] oracle columns are TIMESTAMPTZ (driver schema_match "
            f"would fail): {tz_cols} — CAST to plain TIMESTAMP in the SQL"
        )
        return problems
    # Decimal guard (the r5 AND r6 failure modes): any compared decimal128
    # column is a driver hash hazard.  r5: DuckDB sum(BIGINT)→HUGEINT vs
    # Spark int64.  r6: BOTH sides decimal with identical values, but
    # Spark's Arrow export carries value-inferred precision
    # (decimal128(11,2)) where DuckDB carries the declared one
    # (decimal128(28,2)) — still a driver hash-fail.  So no compared
    # column may be decimal on EITHER side: keep decimal arithmetic
    # internal and emit exact integer cents (CAST(x*100 AS BIGINT)).
    spark_types = {f.name: f.dataType for f in df.schema.fields}
    for c in dec_cols:
        st = spark_types.get(c)
        problems.append(
            f"[{key}] oracle column {c!r} is Arrow decimal128 (Spark side: "
            f"{st.simpleString() if st is not None else '<missing>'}) — a "
            f"driver hash hazard even when both sides are decimal (Arrow "
            f"precision is value-inferred on Spark, declared on DuckDB); "
            f"compare exact integer cents: CAST(... * 100 AS BIGINT)"
        )
    for f in df.schema.fields:
        if isinstance(f.dataType, T.DecimalType) and f.name not in dec_cols:
            problems.append(
                f"[{key}] Spark column {f.name!r} is DecimalType but the "
                f"oracle side is not decimal — driver hash hazard; emit "
                f"exact integer cents on both sides"
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
