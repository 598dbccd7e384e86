"""Hash-stable floating-point aggregation helpers.

Summing IEEE doubles is order-dependent; a Spark shuffle and a DuckDB
hash aggregate will sum partitions in different orders and disagree in
the last bits, breaking value-hash comparison (and, at scale, making
re-runs non-reproducible). The fix: route money/rate columns through
exact DECIMAL arithmetic — associative, so any execution order yields
the same result — and cast back to DOUBLE at the end.

DECIMAL widths are chosen so intermediate products never overflow
Spark's 38-digit cap even at large scale factors:
  money  DECIMAL(12,4)  (values < 1e8)
  rate   DECIMAL(8,4)   (discounts, taxes, quantities < 1e4)
A money*rate*rate chain is (12,4)x(8,4)x(8,4) -> scale 12, precision 30;
its SUM fits 38 digits for up to ~1e8 rows per group. The same literal
cast pattern must appear in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,4)"
RATE = "decimal(8,4)"


def dmoney(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def drate(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def snap(col: Column) -> Column:
    """Normalize an exact decimal to scale 6 before the DOUBLE cast.

    A high-scale decimal (e.g. the scale-12 sum of a money*rate*rate
    chain) casts to DOUBLE through an int128/10^12 division whose
    rounding differs between engines; at scale 6 the scaled integer
    fits in 2^53 (sums < ~9e9), so decimal->double is exact everywhere.
    Scale 6 itself loses nothing: the source data carries 2 decimal
    digits, so any product of three factors has <= 6 — the scale
    reduction never rounds (it must not: Spark casts round half-up,
    DuckDB casts truncate).
    """
    return col.cast("decimal(38,6)").cast("double")


def dsum(col: str | Column, alias: str) -> Column:
    """Exact sum of a money column, surfaced as DOUBLE."""
    return snap(F.sum(dmoney(col))).alias(alias)


def dsum_expr(expr: Column, alias: str) -> Column:
    """Exact sum of a decimal expression, surfaced as DOUBLE."""
    return snap(F.sum(expr)).alias(alias)


def exact_div(num: Column, den: Column, alias: str) -> Column:
    """Deterministic average: exact sums divided once in DOUBLE."""
    return (num.cast("double") / den.cast("double")).alias(alias)
