"""Custom stateful streaming operator via ``applyInPandasWithState``
— the extension point for semantics the builtin window aggregations
can't express (per-key running extremes, custom session logic,
online sketches).

The operator here tracks per-user peaks (max value, event count)
across micro-batches: state is a (max, count) pair per user, merged
with each batch's contribution, and the updated snapshot is emitted.
With AvailableNow's single batch the emitted snapshot equals the
batch aggregate — so even this custom stateful op gets a full DuckDB
oracle rather than a rows-only check.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from mapreduce_inverted_index_spark.streaming.windows import (
    _run_to_table,
    events_stream,
)

__all__ = ["stateful_user_peaks"]

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("peak_value", DoubleType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("peak", DoubleType()), StructField("cnt", LongType())]
)


def _update_peaks(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    peak, cnt = state.get if state.exists else (float("-inf"), 0)
    for pdf in batches:
        if len(pdf):
            peak = max(peak, float(pdf["value"].max()))
            cnt += len(pdf)
    state.update((peak, cnt))
    yield pd.DataFrame(
        {"user_id": [key[0]], "peak_value": [peak], "n_events": [cnt]}
    )


def stateful_user_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user (max value, event count) maintained as streaming
    state; snapshot emitted per batch."""
    ev = events_stream(spark, sf_dir)
    peaks = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_peaks,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return _run_to_table(peaks, mode="append")
