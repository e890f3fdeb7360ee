"""Data-layout expressions: multi-dimensional clustering keys.

``morton_code`` builds the bit-interleaved z-order key used by
Delta/Iceberg-style ``OPTIMIZE ZORDER BY`` file clustering (the reference's
storage layer is Delta — /root/reference/src/03_gold_realtime_rides.py:75).
Sorting or bucketing by the z-value co-locates rows that are close in ALL
interleaved dimensions, so per-file min/max column statistics become tight
rectangles and multi-dimensional predicates prune files.

Pure integer arithmetic (shiftleft/shiftright/AND) — stays inside
whole-stage codegen; the guarantee tested in tests/test_properties.py is
the textbook one: a bucket of 2^(2b - k) consecutive z-values spans at most
2^ceil((2b-k)/2) distinct values in each dimension.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns:
    bit i of x lands at position 2i, bit i of y at 2i+1. Caller masks the
    inputs into [0, 2^bits) first (e.g. ``col % 256`` for bits=8).

    ``bits`` is capped at 31: the z-value is built in a LONG (64-bit), and
    the highest interleaved bit lands at position 2*bits-1 = 61 < 63, so
    the sign bit is never touched (for bits > 15 an INT accumulator would
    silently corrupt z — the former public-API hazard)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xi = x.cast("long")
    yi = y.cast("long")
    z: Column = F.lit(0)
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(xi, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(yi, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def morton_code_py(x: int, y: int, bits: int) -> int:
    """Driver-side reference twin of ``morton_code`` (property tests)."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z
