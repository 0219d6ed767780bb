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


def test_kmv_sketch_exact_below_k_and_estimates_above(spark):
    """Below k distinct values the sketch IS the distinct set (exact
    estimate); above k the estimator lands within a loose band; the
    pairwise overlap recovers a planted 50% intersection."""
    from pyspark.sql import functions as F

    from mapreduce_inverted_index_spark.operators.sketches import (
        kmv_pairwise_overlap,
        kmv_sketch,
    )

    # group 'small': 10 distinct; groups 'x'/'y': 2000 distinct each
    # sharing exactly 1000 (ids 1000..1999)
    rows = (
        [("small", v) for v in range(10)]
        + [("x", v) for v in range(2000)]
        + [("y", v) for v in range(1000, 3000)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketch(df, ["g"], "v", k=64)
    by_g = {r["g"]: r for r in sk.collect()}
    assert by_g["small"]["n_kept"] == 10
    assert by_g["x"]["n_kept"] == 64
    assert list(by_g["x"]["kmv"]) == sorted(by_g["x"]["kmv"])

    ov = {
        (r["a"], r["b"]): r
        for r in kmv_pairwise_overlap(sk, "g", k=64).collect()
    }
    sx = ov[("small", "x")]
    assert sx["est_a"] == 10, "below-k estimate is exact"
    # k=64 standard error ~ 1/sqrt(k-1) ~ 12.6%; allow 3 sigma
    xy = ov[("x", "y")]
    assert abs(xy["est_a"] - 2000) < 800 and abs(xy["est_b"] - 2000) < 800
    assert abs(xy["est_union"] - 3000) < 1200
    # true jaccard = 1000/3000 = 0.3333; j is k-sample binomial
    assert 120_000 < xy["jaccard_e6"] < 560_000
    assert abs(xy["est_intersection"] - 1000) < 700
    # disjoint with 'small' (values 0..9 all < 1000 shared? 'small'
    # is 0..9, 'y' is 1000..2999 — fully disjoint)
    sy = ov[("small", "y")]
    assert sy["jaccard_e6"] <= 60_000 and sy["est_intersection"] <= 200
