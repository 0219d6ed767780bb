"""Scale-capable oracle twins (VERDICT r11 ask #3) equal the naive
oracles at fixture scale.

The naive oracle stays the sf<=0.1 driver gate (it is the
independently-simple spec); the scaled twin mirrors the engine's
banding/blocking — ppjoin prefix-filtered candidates, materialized
pair lists (so DuckDB's morsel planner sees pair rows, not the 50k
input docs), unrolled pointer-jumping components, PassJoin pigeonhole
segments, time-grid binning — so the sf1+ sweeps get exact-value
checks where the naive form is super-linear. These tests pin the two
forms EQUAL, which is what makes the scaled form an oracle at all.
Pure DuckDB — no SparkSession.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_inverted_index_spark.plans import registry

SCALED = [
    "ngram_jaccard_pairs",
    "dedup_components",
    "dedup_keep_best",
    "fuzzy_unblocked_pairs",
    "keyless_band_pairs_events",
]


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_oracle}/{t}.parquet')"
        )
    return c


def test_exactly_the_sf1_rows_only_set_carries_scaled_oracles():
    """The scaled tier exists for the 5 queries whose naive oracles
    went rows-only at sf1 (SCALING.md table) — no more, no less."""
    have = {
        n for n, q in registry.all_queries().items()
        if q.oracle_scaled is not None
    }
    assert have == set(SCALED)


@pytest.mark.parametrize("name", SCALED)
def test_scaled_oracle_equals_naive(con, name):
    q = registry.all_queries()[name]
    assert q.oracle is not None and q.oracle_scaled is not None
    naive = sorted(map(tuple, con.execute(q.oracle).fetchall()))
    scaled = sorted(map(tuple, con.execute(q.oracle_scaled).fetchall()))
    assert naive == scaled
    assert (
        [d[0] for d in con.execute(q.oracle).description]
        == [d[0] for d in con.execute(q.oracle_scaled).description]
    )
