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
    StringType,
    StructField,
    StructType,
)

from mapreduce_inverted_index_spark.streaming.windows import (
    _run_to_table,
    events_stream,
)

__all__ = ["stateful_user_peaks", "tws_user_type_totals", "stateful_transition_counts"]

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
    # Explicit projection BEFORE the opaque stateful node: Catalyst
    # cannot prune columns through applyInPandasWithState (the
    # function is a black box), so without this select every event
    # column — including the props payload the function never reads —
    # is shuffled to the state partitions and shipped through the
    # Arrow boundary (guide §4). Values identical (pytest + oracle).
    ev = events_stream(spark, sf_dir).select("user_id", "ts", "value")
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


def tws_user_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event_type) running totals on the
    ``transformWithStateInPandas`` API (Spark 4.x's arbitrary-state
    successor to ``applyInPandasWithState``): state variables are
    DECLARED through a typed handle (``getValueState``) instead of
    packed into one tuple, and the same processor class can hold
    value/list/map states plus timers — the surface the old API
    lacked. State here is one (cents, cnt) ValueState per key.

    Exactness: values accumulate as integer cents
    (``floor(v*100+0.5)``, round-half-up both engines) so the
    running sum is order-independent and the emitted double —
    cents/100 — is bit-identical to the DuckDB oracle's. With
    AvailableNow's single batch the snapshot equals the batch
    aggregate, giving this custom stateful op a full value oracle.
    Output: ``user_id, event_type, total_value, n_events``.

    Environment gate (same pattern as ``multimodal.decode_image``'s
    PIL gate): transformWithState's Python worker speaks a protobuf
    protocol to the JVM state server, so it needs the ``protobuf``
    package at runtime. This container ships pyspark WITHOUT
    protobuf; the operator raises a clear ImportError here and its
    test skips — the code path is exercised wherever protobuf is
    present (any standard pyspark[connect] install). The
    equivalent semantics stay fully driver-proven through
    ``stateful_user_peaks`` (applyInPandasWithState, no protobuf).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(pyspark's state-server protocol); not available in this "
            "environment — use stateful_user_peaks "
            "(applyInPandasWithState) for the same semantics"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "totals", "cents long, cnt long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            cents, cnt = (
                self._st.get() if self._st.exists() else (0, 0)
            )
            for pdf in rows:
                if len(pdf):
                    v = pdf["value"].to_numpy(dtype="float64")
                    cents += int(
                        np.floor(v * 100.0 + 0.5).astype("int64").sum()
                    )
                    cnt += len(pdf)
            self._st.update((cents, cnt))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "event_type": [key[1]],
                    "total_value": [cents / 100.0],
                    "n_events": [cnt],
                }
            )

        def close(self) -> None:
            pass

    # Same boundary-width discipline as the applyInPandasWithState
    # operators: project to the columns the processor reads (value)
    # plus the watermark/grouping keys before the opaque node.
    ev = events_stream(spark, sf_dir).select(
        "user_id", "event_type", "ts", "value"
    )
    out = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id", "event_type")
        .transformWithStateInPandas(
            _Totals(),
            outputStructType=(
                "user_id long, event_type string, "
                "total_value double, n_events long"
            ),
            outputMode="append",
            timeMode="none",
        )
    )
    # transformWithState keeps each declared state variable in its own
    # column family, which only RocksDBStateStoreProvider supports (the
    # default HDFS-backed provider fails the query with
    # STATE_STORE_MULTIPLE_COLUMN_FAMILIES_NOT_SUPPORTED). The provider
    # is resolved when the query STARTS, so set it for the duration of
    # the one AvailableNow run and restore the session's previous value
    # — other streaming queries keep their default provider.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        return _run_to_table(out, mode="append")
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)


_TRANS_OUT = StructType(
    [
        StructField("from_state", StringType()),
        StructField("to_state", StringType()),
    ]
)

_TRANS_STATE = StructType([StructField("last", StringType())])


def _update_transitions(
    key: tuple, batches: "Iterator[pd.DataFrame]", state: "GroupState"
):
    # A group larger than arrow maxRecordsPerBatch (~10k rows) arrives
    # as MULTIPLE Arrow chunks within one micro-batch, in shuffle
    # (unsorted) order ACROSS chunks. Sorting each chunk independently
    # and chaining `last` between them would fabricate chunk-boundary
    # transitions, so buffer every chunk for the key, sort the whole
    # group ONCE, then shift. Memory is bounded by the group's rows in
    # this micro-batch — the same bound any correct order restoration
    # needs (a k-way chunk merge would still hold all chunks).
    last = state.get[0] if state.exists else None
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        # The user's true order is (ts, event_id); restored here
        # because grouped batches arrive in shuffle order. Vectorized
        # shift, no per-row loop.
        pdf = pdf.sort_values(["ts", "event_id"])
        seq = pdf["event_type"].reset_index(drop=True)
        prev = seq.shift(1)
        if last is not None:
            prev.iloc[0] = last
        mask = prev.notna()
        last = seq.iloc[-1]
        if mask.any():
            yield pd.DataFrame(
                {
                    "from_state": prev[mask].to_numpy(),
                    "to_state": seq[mask].to_numpy(),
                }
            )
    state.update((last,))


def stateful_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-maintained Markov transition observations: per-user
    ``last event_type`` kept as streaming state, so the pair that
    SPANS a micro-batch boundary (last event of batch N → first of
    batch N+1) is emitted correctly — the part a stateless
    per-batch lag would silently drop. Emitted observations
    accumulate in the sink; the caller rolls them up to the
    transition matrix in batch (counts exact, one division).

    With AvailableNow's single batch this equals the batch lag
    exactly → full value oracle; the multi-batch boundary behavior
    is pytest-proven with a chunked feed (the
    ``incremental_index_merge`` evidence pattern).
    """
    # Project to the four columns the update function reads before
    # the opaque stateful node — column pruning stops at
    # applyInPandasWithState, so the unused value/props columns would
    # otherwise ride the state shuffle and the Arrow exchange
    # (guide §4; same discipline as stateful_user_peaks).
    ev = events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    pairs = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=_TRANS_OUT,
            stateStructType=_TRANS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return _run_to_table(pairs, mode="append")
