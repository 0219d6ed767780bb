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

__all__ = ["salted_sum_count"]


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
