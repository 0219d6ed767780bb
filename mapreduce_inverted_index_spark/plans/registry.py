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
# Rounds 1-3 covered 85 of the 112 names; these 27 never fell inside
# any round's window (multimodal + sketches + the relational tail +
# two round-3 additions).
# They lead the catalog this round so every name has a driver row;
# the rest follow in registration order, which re-checks the
# flagship index family in the remaining window slots.
_DRIVER_PRIORITY = (
    "media_stats",
    "media_features",
    "media_frame_samples",
    "media_exact_dedup",
    "hll_rollup_merge_users",
    "approx_quantiles_lineitem",
    "multiset_ops_orderkeys",
    "shipping_priority_topk",
    "forecast_revenue_filter_agg",
    "calendar_axis_order_counts",
    "window_rank_family",
    "bool_agg_flags",
    "date_arithmetic_orders",
    "full_outer_nation_footprint",
    "customer_order_distribution",
    "large_volume_orders",
    "quiet_rich_customers",
    "percentile_quantity_by_flag",
    "unpivot_lineitem_measures",
    "time_range_window_orders",
    "value_window_family",
    "width_bucket_price_histogram",
    "string_agg_rich_names",
    "grouping_id_rollup",
    "sessionize_events",
    # Round-3 additions that postdate the reorder — they too have
    # never been inside a driver window.
    "simhash_hamming_pairs",
    "groupwise_zscore_pandas_api",
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
