"""Regression tests for the round-1 advisor findings: dup_components
convergence on long chains (pointer jumping + non-convergence raise),
asof_join deterministic tiebreaks and NULL-payload carry, and the
assign_partition_ids partitioning-mismatch guard.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.operators.asof import asof_join
from mapreduce_inverted_index_spark.operators.dedup import dup_components


def test_dup_components_long_chain_converges(spark):
    """A 60-doc duplicate chain (diameter 59) — longer than any sane
    fixed iteration cap — must still collapse to one component:
    pointer jumping makes convergence O(log diameter), so the default
    max_iter covers it with room to spare."""
    n = 60
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a bigint, doc_b bigint"
    )
    out = dup_components(pairs)
    rows = {r["doc_id"]: r["component"] for r in out.collect()}
    assert len(rows) == n
    assert set(rows.values()) == {0}


def test_dup_components_raises_when_iteration_cap_too_low(spark):
    """Exhausting max_iter with labels still moving must raise, not
    silently return wrong components."""
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a bigint, doc_b bigint"
    )
    with pytest.raises(RuntimeError, match="still changing"):
        dup_components(pairs, max_iter=1)


def test_asof_join_equal_timestamp_ties_are_deterministic(spark):
    """Multiple right rows at the same (key, ts): the greatest payload
    struct wins — every run, not whichever partition arrived last."""
    left = spark.createDataFrame(
        [(1, 100)], "k bigint, lts bigint"
    ).withColumn("lts", F.timestamp_seconds("lts"))
    right = spark.createDataFrame(
        [(1, 50, "a"), (1, 50, "c"), (1, 50, "b")],
        "k bigint, rts bigint, payload string",
    ).withColumn("rts", F.timestamp_seconds("rts"))
    for _ in range(3):
        out = asof_join(
            left.repartition(8), right.repartition(8),
            key="k", left_ts="lts", right_ts="rts", right_vals=["payload"],
        ).collect()
        assert len(out) == 1
        assert out[0]["asof_payload"] == "c"


def test_asof_join_null_payload_not_skipped(spark):
    """A later right row whose payload is legitimately NULL must win
    over an older non-null row (the struct carry preserves it; a bare
    last(col, ignoreNulls) would skip it)."""
    left = spark.createDataFrame(
        [(1, 100)], "k bigint, lts bigint"
    ).withColumn("lts", F.timestamp_seconds("lts"))
    right = spark.createDataFrame(
        [(1, 10, "old"), (1, 50, None)],
        "k bigint, rts bigint, payload string",
    ).withColumn("rts", F.timestamp_seconds("rts"))
    out = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_vals=["payload"],
    ).collect()
    assert len(out) == 1
    assert out[0]["asof_payload"] is None


def test_asof_join_no_match_yields_nulls(spark):
    left = spark.createDataFrame(
        [(1, 5)], "k bigint, lts bigint"
    ).withColumn("lts", F.timestamp_seconds("lts"))
    right = spark.createDataFrame(
        [(1, 50, "later")], "k bigint, rts bigint, payload string"
    ).withColumn("rts", F.timestamp_seconds("rts"))
    out = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_vals=["payload"],
    ).collect()
    assert len(out) == 1
    assert out[0]["asof_payload"] is None
