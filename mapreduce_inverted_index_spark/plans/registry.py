"""Named-query registry with DuckDB oracle twins.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional ANSI-SQL string DuckDB can run against the same parquet
tables. Column names MUST match between the two (the differential
driver sorts columns by name before hashing values).

Entries without an oracle (streaming, LSH, other non-SQL-expressible
ops) get a rows-only check from the driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

# Modules that define queries; imported lazily on first access so the
# registry has no import-order footguns.
#
# ORDER MATTERS: the driver's correctness window walks the catalog in
# registration order and may cap out before the end, so the
# north-star families (index parity, LLM data pipeline, streaming,
# multimodal) register BEFORE the long relational tail.
_QUERY_MODULES = (
    "mapreduce_inverted_index_spark.plans.queries_index",
    "mapreduce_inverted_index_spark.plans.queries_llm",
    "mapreduce_inverted_index_spark.plans.queries_streaming",
    "mapreduce_inverted_index_spark.plans.queries_multimodal",
    "mapreduce_inverted_index_spark.plans.queries_sketches",
    "mapreduce_inverted_index_spark.plans.queries_relational",
)


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a ``(spark, sf_dir) -> DataFrame`` to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _load() -> None:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Allow partial builds: a missing query module just means
            # its queries aren't registered yet.
            if mod.rsplit(".", 1)[-1] not in str(e):
                raise


def all_queries() -> dict[str, Query]:
    """The full catalog (loads query modules on first call)."""
    if not _REGISTRY:
        _load()
    return dict(_REGISTRY)
