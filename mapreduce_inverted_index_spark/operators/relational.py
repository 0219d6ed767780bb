"""Reusable relational operators (SURVEY.md §2.9: everything the
reference lacks, provided Spark-natively).

These are thin, deliberately declarative compositions — the engine's
job is to hand Catalyst a plan it can optimize (pushdown, join
reordering, partial aggregation), not to schedule anything by hand.

Scale notes baked into each operator:
  * ``join_dim`` broadcasts dimension tables explicitly — at 100 TB
    the fact side never shuffles for a small-dim join.
  * ``top_k_per_group`` uses a window with a UNIQUE tiebreak order —
    nondeterministic top-k is a correctness bug waiting for a retry.
  * ``global_top_k`` is sort+limit: Spark plans TakeOrderedAndProject
    (per-partition heap + driver merge), O(k) memory, no full sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "join_dim",
    "top_k_per_group",
    "global_top_k",
    "running_total",
    "lag_lead",
    "sessionize",
]


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    *,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact↔dimension join; dimension broadcast by default so the
    fact side stays un-shuffled (map-side hash join)."""
    return fact.join(F.broadcast(dim) if broadcast_dim else dim, on, how)


def _cols(cols: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ``row_number``; caller must make
    ``order_by`` a total order (include a unique key)."""
    w = Window.partitionBy(*group_by).orderBy(*_cols(order_by))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def global_top_k(df: DataFrame, order_by: Sequence[Column | str], k: int) -> DataFrame:
    """Global top-k — planned as TakeOrderedAndProject, never a full
    cluster-wide sort."""
    return df.orderBy(*_cols(order_by)).limit(k)


def running_total(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column | str],
    value: Column,
    alias: str,
) -> DataFrame:
    """Cumulative aggregate per group (rows unbounded-preceding..current)."""
    w = (
        Window.partitionBy(*group_by)
        .orderBy(*_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value).over(w))


def lag_lead(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column | str],
    col: str,
) -> DataFrame:
    """Previous/next value of ``col`` within each group."""
    w = Window.partitionBy(*group_by).orderBy(*_cols(order_by))
    return df.withColumn(f"prev_{col}", F.lag(col).over(w)).withColumn(
        f"next_{col}", F.lead(col).over(w)
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_s: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gaps-and-islands sessionization: assign ``sess_no`` per key.

    A new session starts when the gap to the previous event (whole
    seconds, epoch floor) EXCEEDS ``gap_s`` — a gap of exactly
    ``gap_s`` stays in the session. Adds ``sess_no`` (1-based INT).

    Both the lag and the running sum share one window over
    ``key_col``; Catalyst plans a single exchange, so the whole
    assignment costs one shuffle regardless of data size. Events with
    equal timestamps are ordered by ``tiebreak_col`` (pass a unique
    id for fully deterministic numbering).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    ts_s = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(ts_s).over(w)
    new_sess = F.when(prev.isNull() | ((ts_s - prev) > gap_s), 1).otherwise(0)
    return df.withColumn(
        "sess_no",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
