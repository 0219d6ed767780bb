"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship inverted-index query on sf0.001 (smoke).
``queries()`` — every implemented operator as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI-SQL twin per query (where
SQL-expressible; streaming/LSH entries are rows-only checked).

Implementation lives in ``mapreduce_inverted_index_spark`` (see
SURVEY.md §2 for the operator inventory this catalog covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from mapreduce_inverted_index_spark.plans.registry import all_queries  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Full reference data plane in one expression: documents → tokenize
    (P1-P4) → per-doc distinct (P5) → explode (P6) → groupBy term →
    sorted distinct postings + df (A1-A4).
    """
    from mapreduce_inverted_index_spark.operators.inverted_index import build_index
    from mapreduce_inverted_index_spark.sources.tables import load_table

    docs = load_table(spark, _SMOKE_SF_DIR, "documents")
    return build_index(docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for rows-only checks)."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
