"""Data-quality column profiling: the health gate a pipeline runs
before ingesting a new batch into a 100 TB corpus.

One aggregate pass computes per-column completeness (null counts),
cardinality, and value ranges; the wide single-row aggregate is then
unpivoted to one row per column. Everything is builtin expressions —
the only cost beyond a plain scan is the multi-column exact
``count_distinct`` (Catalyst plans it as an Expand; swap to
``approx_count_distinct`` when profiling hundreds of columns at
cluster scale — the plan shape is otherwise identical).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["column_profile"]


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile: ``column, n_rows, n_null, n_distinct,
    min_value, max_value`` (min/max rendered as strings so mixed
    column types share one output schema).

    Single wide aggregate → unpivot. No shuffle beyond the one
    global aggregate; column pruning keeps the scan at exactly
    ``cols``.
    """
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_cnt_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_mn_{c}"),
            F.max(c).cast("string").alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _cnt_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return wide.select(
        F.col("_n"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column, _cnt, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column",
        F.col("_n").alias("n_rows"),
        (F.col("_n") - F.col("_cnt")).alias("n_null"),
        "n_distinct",
        "min_value",
        "max_value",
    )
