"""Shared fixtures: one SparkSession per test session, sf dirs."""

from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"
# Oracle tests default to the driver's correctness scale (sf0.01);
# override with MII_TEST_SF_DIR=/root/testdata/sf0.001 for quick loops.
SF_ORACLE = os.environ.get("MII_TEST_SF_DIR", "/root/testdata/sf0.01")


def pytest_collection_modifyitems(items):
    """Run the catalog-wide schema guard LAST.

    It consumes the session ``query_df`` construct-once cache that the
    oracle differential populates; schemas are fixed at plan analysis,
    so a cached plan is always fresh enough for a schema assertion
    (the guard runs no jobs). The differential, by contrast, must
    construct-and-materialize each query back to back: a handful of
    catalog queries read shared on-disk index/cell stores that OTHER
    queries' constructions rewrite, so a plan cached ahead of time can
    pin part-file names that no longer exist when finally executed
    (observed: ``prefix_query_index`` over the bucketed index store).
    Ordering the guard after the differential gives every query ONE
    construction per suite with zero execution staleness.
    """
    # match on the file::test fragment, not a "tests/" prefix — the
    # nodeid's leading path depends on pytest's rootdir resolution
    # (invocation cwd / args), and the guard must sort last under any
    guard = "test_driver_compat.py::test_no_unhashable_columns"
    items.sort(key=lambda it: guard in it.nodeid)


@pytest.fixture(scope="session")
def spark():
    from mapreduce_inverted_index_spark.session import get_spark

    # UI/console-progress bookkeeping off for the test session only:
    # the suite submits thousands of sub-second jobs, and the live UI
    # event store + \r progress bars are pure per-job overhead here
    # (nothing in tests reads the UI or its REST API — measurement
    # tooling like tools/profile_query.py builds its own session).
    # Plans, configs that affect plans, and executed semantics are
    # untouched — the driver's correctness gate tests the same engine.
    s = get_spark(
        app_name="mii-tests",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE


@pytest.fixture(scope="session")
def query_df(spark):
    """Construct-once cache for catalog query DataFrames, keyed
    (name, sf_dir).

    Several catalog fns do EAGER work at construction time (IVF
    cell-store seed writes, iterative localCheckpoint rounds,
    AvailableNow stream folds); the catalog-wide schema guard and the
    oracle differential each constructed every oracle-carrying query,
    paying that eager work twice per query per suite run (~100 s of
    the r13 wall time the driver's capped run could not afford —
    VERDICT r13 ask #1). Both now draw from this cache: the first
    test to touch a (name, sf) pays construction, later ones reuse
    the same DataFrame — the same within-process reuse bench.py's
    passes already rely on. DataFrames are lazy plans; caching them
    holds no row data beyond what the query itself persists.
    """
    from mapreduce_inverted_index_spark.plans.registry import all_queries

    cat = all_queries()
    cache: dict[tuple[str, str], object] = {}

    def get(name: str, sf_dir: str):
        key = (name, sf_dir)
        if key not in cache:
            cache[key] = cat[name].fn(spark, sf_dir)
        return cache[key]

    return get
