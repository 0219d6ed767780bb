"""Skew-mitigation patterns: salted two-phase aggregation.

AQE's skew-join splitting handles join-side skew automatically; for
*aggregation* skew (a handful of hot keys swamping their reducers)
the classic fix is salting: scatter each hot key across ``n_salts``
sub-keys, partially aggregate, then merge the partials. Correct for
any associative-mergeable aggregate (sum/count/min/max, and means as
sum+count pairs).

At the fixture's scale salting is pure overhead — the point of the
operator is the pattern and its verified equivalence to the plain
aggregation (oracle-checked), so it can be applied when a key
histogram says so at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_sum_count", "join_skew_profile"]


def join_skew_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_n: int = 10,
) -> DataFrame:
    """Pre-join skew diagnosis: per-key row counts on BOTH sides and
    the key's join fan-out (``n_left · n_right`` — the number of
    output rows that key alone will produce), for the ``top_n``
    worst keys plus their share of the total estimated output.

    Output: ``key, n_left, n_right, est_out_rows, est_out_share``
    (share rounded to 6), ordered worst-first — the planning signal
    that decides between a plain shuffle join, AQE skew-split,
    salting (``salted_sum_count``), or bounded_block_join chunking
    BEFORE burning a cluster-day discovering the skew the hard way.

    Shape at scale: two key-histogram aggregations (map-side
    combined: shuffle rows are (key, count) — never data rows), an
    inner join of the two histograms (distinct-key-sized), one
    scalar total, and a top-n. Cost is O(distinct keys), independent
    of fact-table width.
    """
    lh = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count("*").alias("n_left")
    )
    rh = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count("*").alias("n_right")
    )
    fan = lh.join(rh, "key").select(
        "key",
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).alias("est_out_rows"),
    )
    total = fan.agg(F.sum("est_out_rows").alias("_total"))
    return (
        fan.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_left",
            "n_right",
            "est_out_rows",
            F.round(
                F.col("est_out_rows").cast("double") / F.col("_total"), 6
            ).alias("est_out_share"),
        )
        .orderBy(F.col("est_out_rows").desc(), F.col("key"))
        .limit(top_n)
    )


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: Column,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase sum+count per ``keys``: phase 1 groups on
    (keys, salt) — spreading each key over ``n_salts`` reducers —
    phase 2 merges the partials per key.

    ``salt_source``: a column whose hash spreads rows (default: a
    per-partition-uniform hash of all key-independent entropy —
    here, ``xxhash64`` of the whole row id column isn't assumed, so
    callers pass one; determinism of the *result* never depends on
    the salt values). Output: ``*keys, sum_value (decimal-exact
    double), n_rows``.
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(value.cast("decimal(18,2)")).alias("_psum"),
            F.count("*").alias("_pcnt"),
        )
    )
    return phase1.groupBy(*keys).agg(
        F.round(F.sum("_psum"), 2).cast("double").alias("sum_value"),
        F.sum("_pcnt").alias("n_rows"),
    )
