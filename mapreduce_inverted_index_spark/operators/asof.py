"""Time-series joins Spark lacks as builtins: as-of and range joins,
composed from existing DataFrame ops (the SURVEY §4.3 guidance:
composition first, Pandas UDFs only if semantics demand).

**As-of join** (each left row ↔ most recent right row at-or-before
its timestamp) via the union trick:

    tag both sides → union → per-key window ordered by (time, side)
    → ``last(right_cols, ignoreNulls)`` carries the latest right
    value forward → keep left rows.

One shuffle on the key (the window), no range-explosion, no skew
beyond the key's own — the standard scalable formulation. A
merge-join-per-key ``applyInPandas`` variant would trade JVM window
state for Python; unnecessary here.

**Range join** (pairs within a time band) = equi-join on the key +
band predicate. Catalyst plans the equi part as a hash join and the
band as a post-filter, so cost is Σ|key-group|² only within keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    right_key: str | None = None,
) -> DataFrame:
    """For each left row: the ``right_vals`` of the most recent right
    row with ``right_ts <= left_ts`` for the same key (``key`` on the
    left, ``right_key`` — default ``key`` — on the right); nulls when
    none. Ordering puts right rows before left rows at equal
    timestamps, so same-instant matches are included.

    The right payload travels as ONE struct column: ``last(_r,
    ignoreNulls)`` then skips only *left* rows (whose struct is NULL),
    never a right row that legitimately carries NULL values — and the
    window orders by the struct as a final tiebreak, so multiple right
    rows at the same (key, ts) resolve deterministically (greatest
    payload wins) instead of by partition-arrival order.
    """
    from pyspark.sql.types import StructField, StructType

    right_key = right_key or key
    r_struct = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_vals]
    )
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        "*",
        F.lit(None).cast(r_struct).alias("_r"),
    )
    rt = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        F.struct(*[F.col(c) for c in right_vals]).alias("_r"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_asof")
    )
    return carried.where(F.col("_side") == 1).select(
        *[F.col(f.name) for f in left.schema.fields],
        *[F.col("_asof").getField(c).alias(f"asof_{c}") for c in right_vals],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Pairs sharing ``key`` whose timestamps differ by at most
    ``max_gap_seconds``. Equi-join on the key carries the band
    predicate as a join filter."""
    gap = F.abs(
        F.unix_timestamp(left[left_ts]) - F.unix_timestamp(right[right_ts])
    )
    return left.join(right, (left[key] == right[key]) & (gap <= max_gap_seconds))
