"""Cross-engine-stable aggregate helpers.

Floating-point SUM/AVG are order-dependent: Spark and DuckDB add
partitions in different orders, so raw double aggregates can differ in
the last ULP and fail a value-hash comparison. The fix is exact
decimal arithmetic on both sides:

  * cast each operand to DECIMAL(18, s) (both engines round the same
    way for these 2-decimal money columns),
  * aggregate in decimal (exact, order-independent),
  * ROUND(, 2) and only then cast to DOUBLE — the scaled integer
    stays below 2^53, so the decimal→double conversion is the single
    correctly-rounded step in both engines → bit-identical results.

These helpers exist for *differential testing stability*; they do not
change Spark's physical plan shape (still hash-agg with partials).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dec", "dsum", "davg", "sql_dsum", "sql_davg"]

_DEC = "decimal(18,2)"


def dec(col: Column | str) -> Column:
    """Operand → DECIMAL(18,2)."""
    return (F.col(col) if isinstance(col, str) else col).cast(_DEC)


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent, engine-stable SUM over a money column."""
    return F.round(F.sum(dec(col)), 2).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Engine-stable AVG: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.round(F.sum(dec(c)), 2).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,2))), 2) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,2))), 2) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
