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


# The driver's correctness window checks only the FIRST 50 catalog
# entries per round, so catalog order is driver-evidence policy.
# After round 4 every name had a driver row in SOME round's window.
# Round 5 leads with (a) the one red row from round 4
# (media_features: array column broke the driver's canonicalization;
# now scalar-projected), (b) the streaming family, whose green rows
# predate a fixture regeneration that changed the events timestamp
# encoding (the stream source now adapts — that fix needs driver
# evidence), and (c) the round-5 additions. The rest follow in
# registration order, re-checking the flagship index family in the
# remaining window slots.
_DRIVER_PRIORITY = (
    "media_features",
    # round-5 additions
    "tfidf_cosine_pairs",
    "frequent_bigrams",
    "stream_attribution_join",
    "stream_enriched_segment_counts",
    "label_centroid_cosines",
    "doc_terms_udtf_api",
    "fuzzy_key_pairs",
    "dq_profile_lineitem",
    # streaming family: re-evidence after the fixture ts change
    "stream_tumbling_counts",
    "stream_sliding_avg",
    "stream_session_windows",
    "stream_dedup_events",
    "stream_stateful_user_peaks",
)


def all_queries() -> dict[str, Query]:
    """The full catalog (loads query modules on first call).

    Iteration order = ``_DRIVER_PRIORITY`` first, then registration
    order; see the comment on ``_DRIVER_PRIORITY``.
    """
    if not _REGISTRY:
        _load()
    prioritized = {n: _REGISTRY[n] for n in _DRIVER_PRIORITY if n in _REGISTRY}
    prioritized.update(_REGISTRY)
    return prioritized
