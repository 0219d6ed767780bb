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
