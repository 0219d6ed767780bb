"""Mergeable-sketch properties (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.operators import sketches as S


def test_hll_rollup_merge_tracks_oneshot_and_exact(spark):
    """Merging per-bucket sketches tracks a one-shot sketch and the
    exact count regardless of bucketing. (Union is NOT bit-identical
    to one-shot once the sketch goes dense — the union target HLL_8
    and mode transitions differ — so the contract is a band, not
    equality.)"""
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 613).alias("v"),
        (F.col("id") % 13).alias("bucket_a"),
        (F.col("id") % 3).alias("bucket_b"),
    )
    exact = {
        r["k"]: r["e"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("e")).collect()
    }
    oneshot = {
        r["k"]: r["est"]
        for r in df.groupBy("k")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12))).alias("est"))
        .collect()
    }
    for bucket in ("bucket_a", "bucket_b"):
        rolled = S.hll_merge(
            S.hll_rollup(df, ["k"], F.col(bucket), "v"), ["k"], "est"
        )
        got = {r["k"]: r["est"] for r in rolled.collect()}
        for k, est in got.items():
            assert abs(est - oneshot[k]) / exact[k] <= 0.02, (bucket, k)
            assert abs(est - exact[k]) / exact[k] <= 0.05, (bucket, k)


def test_hll_estimate_within_band_small_domain(spark):
    """Small exact domains estimate near-exactly (HLL is exact below
    the sparse→dense switch)."""
    df = spark.range(5_000).select((F.col("id") % 50).alias("v"))
    est = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    assert est == 50


def test_approx_quantiles_rank_checked_all_true(spark):
    df = spark.range(20_000).select(
        (F.col("id") % 2).alias("g"), F.rand(seed=7).alias("x")
    )
    rows = S.approx_quantiles_rank_checked(df, "g", "x", (0.25, 0.5, 0.95)).collect()
    assert len(rows) == 6
    assert all(r["within_tol"] for r in rows)
