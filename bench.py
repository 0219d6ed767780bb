"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is fully evaluated via the ``noop`` sink (every output
column computed, nothing shipped to the driver) after a warmup pass
of the flagship to amortize JVM/codegen startup out of the first
measurement.

Why noop and not ``count()``: Catalyst prunes columns through a
bare count, so a map-only pipeline (e.g. signature computation)
collapses to an empty-schema scan and the "benchmark" measures
nothing. Round 1 used count() and under-measured exactly those
queries; the noop numbers here are strictly more honest (and higher)
than the round-1 baseline for map-heavy entries.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Headline set: the flagship pipeline + the heaviest representative of
# each operator family (text agg, relational agg, multiway join,
# window, dedup, similarity). Names must exist in the registry; any
# not-yet-implemented entries are skipped so bench.py never breaks
# mid-build.
# _R1SET is the original 14-query set whose count-eval total defines
# the cross-round baseline ratio (BENCH_r01..r03); keep it frozen so
# that ratio stays apples-to-apples even as HEADLINE grows.
_R1SET = (
    "inverted_index",
    "tf_idf",
    "agg_pricing_summary",
    "multiway_join_region_revenue",
    "shipping_priority_topk",
    "forecast_revenue_filter_agg",
    "broadcast_join_part_revenue",
    "window_topn_orders_per_segment",
    "exact_dedup_docs",
    "minhash_near_dup",
    "simhash_signatures",
    "ann_cosine_topk",
    "text_quality_profile",
    "asof_join_event_order",
)

# The ranked-retrieval surface added in round 2 is flagship-adjacent
# (BM25 is the hottest query a real IR user runs) — benched since r4.
# Round 5 adds the posting-list similarity join, the heavy-hitter
# verify, and the stream-stream interval join. Round 6 adds the
# heaviest member of each new family: passage hygiene (tokenize +
# two aggs + broadcast flag), graph triangles (wedge joins), and the
# MERGE upsert (union + keyed window).
HEADLINE = _R1SET + (
    "positional_index",
    "phrase_query",
    "bm25_topk",
    "incremental_index_merge",
    "tfidf_cosine_pairs",
    "frequent_bigrams",
    "stream_attribution_join",
    "boilerplate_profile",
    "event_graph_triangles",
    "snapshot_merge_orders",
    # late round-6: the iterative-graph family's heaviest member
    # (5 fixed-point power steps = 5 join+agg rounds over the edge
    # list; measures the per-iteration join/shuffle cost)
    "pagerank_user_graph",
    # closing-session: the heaviest members of the final families —
    # the widest TPC-H join tree (Q7: 4 dims + fact-fact), the
    # nested-correlation decorrelation (Q20: persisted scan + two
    # aggs + self-join), the integer-matmul reduction, and the
    # funnel's three chained user-keyed agg-joins
    "volume_shipping_nation_pairs",
    "excess_shipped_part_suppliers",
    "embedding_gram_matrix",
    "event_funnel_conversion",
    # continuation-session: the new operator families — frontier BFS
    # (4 rounds of frontier-join + anti-join), sort-based skyline,
    # sufficient-statistic regression, and the one-pass Hellinger
    # distribution diff (explode + conditional-sum groupBy)
    "graph_bfs_levels",
    "skyline_orders",
    "nation_revenue_trend",
    "source_token_hellinger",
    # second continuation batch: the distributed-prefix-sum family's
    # two members (sweep-line concurrency over sessionized events;
    # exact AUC over the score axis) and the corpus-entropy rollup
    "peak_concurrent_sessions",
    "embedding_dim_auc",
    "corpus_token_entropy",
    # closing batch: the stateful streaming transition matrix (state
    # carry across micro-batches) and the composed per-source
    # mixture dashboard (persisted tokenize scan, two rollups)
    "stream_transition_matrix",
    "source_mixture_report",
    # continuation-session-2: the two manual join strategies and the
    # hashed classifier gate (all sub-second at sf0.1 — recorded so
    # regressions in the census/bin/broadcast plans are attributable)
    "salted_skew_join_events",
    "keyless_band_pairs_events",
    "quality_classifier_margins",
    # round-8: the tokenizer-training loop (8 iterative pair-count +
    # replace rounds over the distinct-token table — the heaviest new
    # operator) and the IVF-backed hard-negative miner (cell-store
    # write + pruned probe + exact-anchor verify in one query)
    "bpe_train_merges",
    "hard_negatives_ivf_contract",
    # late round-8: second-order LM scoring (the heaviest new pure
    # compute: bigram explode + LM broadcast + per-doc decimal rollup)
    "lm_bigram_quality_scores",
    # round-9: the doc-keyed co-located tier's two faces — the raw
    # zero-Exchange tf x dl join and BM25 riding the same tables
    # (both pay the bucketed build once per process, so steady-state
    # numbers are the join/scoring cost the tier buys)
    "colocated_doc_tf_norm",
    "bm25_topk_colocated",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from mapreduce_inverted_index_spark.plans.registry import all_queries
    from mapreduce_inverted_index_spark.session import get_spark

    spark = get_spark(
        app_name="mii-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    queries = all_queries()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warmup: run the flagship once so JVM startup / first-scan costs
    # don't land on the first measured query.
    run(queries["inverted_index"].fn(spark, sf_dir))

    # Each query runs PASSES times; the reported number is the min.
    # A query's first execution pays whole-stage-codegen compilation
    # and JIT warmup — measured 2-5x the steady-state time, pure
    # per-plan constant that amortizes to zero at any real data scale
    # — and shared-machine noise adds multiplicative jitter on top.
    # Min-of-N is the standard estimator for the deterministic cost
    # under one-sided noise.
    PASSES = 2

    from mapreduce_inverted_index_spark.plans.queries_llm import (
        reset_shared_cache,
    )

    def clear_state() -> None:
        # Every pass starts cold-cache: drop the cross-query shared
        # intermediates AND any operator-internal persists, so (a) a
        # query's number is its full standalone cost, not a hit on a
        # prior query's cache, and (b) repeated passes can't pile
        # persisted tables into storage-memory/GC pressure (measured
        # 10x slowdowns on late queries without this).
        reset_shared_cache()
        spark.catalog.clearCache()

    # Iterative / state-store queries pay per-round fixed costs
    # (micro-batch scheduling, lineage truncation, checkpoint IO)
    # that dominate at bench scale and jitter multiplicatively on a
    # shared host — round 8 read 7-22% drift on five of them with NO
    # plan change. They get the third pass regardless of their time,
    # so drift separates from real regression (VERDICT r8 ask #8).
    _JITTER_PRONE = {
        "stream_attribution_join",
        "stream_transition_matrix",
        "graph_bfs_levels",
        "pagerank_user_graph",
        "peak_concurrent_sessions",
        "event_graph_triangles",
        "embedding_dim_auc",
        "bpe_train_merges",
    }

    def best_of(fn, name: str = "") -> tuple[float, list[float]]:
        """(min seconds, all pass samples) — the min is the headline
        estimator (unchanged since r1); the full sample list rides
        along so a median column exists for noise-resistant
        round-over-round comparison (VERDICT r13 ask #3: the r13
        driver host swung identical-plan queries 2x run-to-run, so a
        single min-of-N column cannot separate host noise from plan
        regression; additions only — no existing field changed)."""
        samples: list[float] = []
        for _ in range(PASSES):
            clear_state()
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        # Sub-2s queries are jitter-dominated at min-of-2 (round 6
        # showed +-0.3s swings read as regressions); one extra pass
        # tightens the min estimator where it's cheapest to do so.
        # State-store/iterative queries get it unconditionally.
        if min(samples) < 2.0 or name in _JITTER_PRONE:
            clear_state()
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3), [round(s, 3) for s in samples]

    def _median(xs: list[float]) -> float:
        ys = sorted(xs)
        n = len(ys)
        mid = ys[n // 2] if n % 2 else (ys[n // 2 - 1] + ys[n // 2]) / 2
        return round(mid, 3)

    # Host-drift calibration (VERDICT r10 ask #3): a pinned-size,
    # CPU-bound, whole-stage-codegen'd aggregate over GENERATED data —
    # no fixtures, no shuffle, no Python — so its seconds move only
    # with host conditions (load, frequency, JIT luck), never with
    # engine changes. Cross-epoch BENCH_r{N} totals normalize by the
    # ratio of calibration_sec instead of being bisected after the
    # fact. min-of-3 after one JIT warmup, same estimator as queries.
    def _calibration_job() -> None:
        # h % 100_000 keeps the ANSI-mode sum far from bigint
        # overflow (50M x 1e5 ~ 5e12 << 2^63)
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "pmod(xxhash64(id), 100000) AS h"
        ).selectExpr(
            "sum(h) AS s", "avg(h) AS a", "count(*) AS c"
        ).collect()

    _calibration_job()  # warmup (codegen + JIT)
    calibration = min(
        (lambda t0: (_calibration_job(), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    calibration = round(calibration, 3)

    timings: dict[str, float] = {}
    samples_noop: dict[str, list[float]] = {}
    for name in HEADLINE:
        q = queries.get(name)
        if q is None:
            continue
        timings[name], samples_noop[name] = best_of(
            lambda: run(q.fn(spark, sf_dir)), name
        )

    # Second pass with the round-1 count() methodology so the
    # baseline ratio stays apples-to-apples across rounds (count()
    # lets Catalyst prune map-only pipelines, so this total is lower;
    # see module docstring).
    compat: dict[str, float] = {}
    samples_count: dict[str, list[float]] = {}
    for name in HEADLINE:
        q = queries.get(name)
        if q is None:
            continue
        compat[name], samples_count[name] = best_of(
            lambda: q.fn(spark, sf_dir).count(), name
        )

    # The driver keeps only a ~2 KB tail of stdout and parses the LAST
    # JSON line; round 6's single line carried two 41-query dicts and
    # overflowed the tail, so its front was truncated and the official
    # record was unparseable ("parsed": null). Per-query dicts now go
    # to a sidecar file (plus an early, sacrificial stdout line for
    # human eyes); the FINAL line is a compact summary that carries
    # only the frozen r1 14-query dict and the totals (< 1 KB).
    # Scale-class split (VERDICT r10 ask #2): contract-class queries
    # exist to CHECK production plans against brute-force anchors —
    # their cost is the anchor, not the plan, so they pollute the one
    # headline number the driver tracks round-over-round. Report the
    # production-only and contract-only totals alongside the combined
    # value (kept for continuity).
    by_class: dict[str, float] = {}
    for name, secs in timings.items():
        cls = queries[name].scale_class
        by_class[cls] = round(by_class.get(cls, 0.0) + secs, 3)

    # Calibration-NORMALIZED production total (VERDICT r11 ask #7) —
    # DEMOTED to a coarse diagnostic by the round-13 interleaved A/B
    # (SCALING.md): the calibration job tracks when-in-session it
    # runs, not just host speed (it drifted +36% across an idle-host
    # A/B while query medians moved ~1%, and an order-flipped pair
    # erased its apparent tree dependence), so this ratio AMPLIFIES
    # calibration noise into the headline — it read r12 at +18% vs
    # r11 where four interleaved pairs measured ~+1%. Raw totals are
    # primary; any round-over-round claim beyond ~±10% needs an
    # interleaved A/B of the two committed trees, nothing less.
    REF_CALIBRATION_SEC = 0.217  # pinned: BENCH_r11 driver run
    norm_factor = (
        round(REF_CALIBRATION_SEC / calibration, 4) if calibration else 1.0
    )
    production_total_norm = round(
        by_class.get("production", 0.0) * norm_factor, 3
    )

    detail = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "eval": "noop-full",
        "passes": PASSES,
        "calibration_sec": calibration,
        "headline_production_total": by_class.get("production", 0.0),
        "headline_production_total_normalized": production_total_norm,
        "calibration_ref_sec": REF_CALIBRATION_SEC,
        "contract_total": by_class.get("contract", 0.0),
        # Per-query count-eval timings so round-over-round
        # regressions are attributable per query.
        "count_eval_compat": compat,
        # r14 additions (VERDICT r13 ask #3) — noise-resistant columns:
        # every pass's raw seconds plus the per-query median, noop and
        # count evals. Existing fields above are untouched.
        "queries_samples": samples_noop,
        "queries_median": {n: _median(s) for n, s in samples_noop.items()},
        "count_eval_samples": samples_count,
        "count_eval_median": {n: _median(s) for n, s in samples_count.items()},
        # Frozen r1 14-query set: THE cross-round ratio number.
        "count_eval_compat_total": round(
            sum(s for n, s in compat.items() if n in _R1SET), 3
        ),
        "count_eval_compat_total_all": round(sum(compat.values()), 3),
    }
    with open(os.path.join(REPO_ROOT, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)

    summary = {
        "metric": "headline_queries_total",
        "value": detail["value"],
        "unit": "sec",
        "sf": sf,
        "eval": "noop-full",
        "passes": PASSES,
        "n_queries": len(timings),
        # host-drift normalizer + scale-class split: the production
        # total is the round-over-round comparison number; contract
        # queries' cost is their brute-force anchor, tracked apart
        "calibration_sec": calibration,
        "headline_production_total": by_class.get("production", 0.0),
        "headline_production_total_normalized": production_total_norm,
        "contract_total": by_class.get("contract", 0.0),
        # Frozen r1 14-query set under the r1 count() methodology:
        # the ONLY apples-to-apples cross-round ratio number.
        "count_eval_compat_total": detail["count_eval_compat_total"],
        "count_eval_compat_total_all": detail["count_eval_compat_total_all"],
        # Per-query dict restricted to the frozen set, SAME semantics
        # as prior rounds' final-line "queries" (noop-full seconds —
        # round-over-round tooling compares like with like); the
        # count-eval twin rides in its own key.
        "queries": {n: s for n, s in timings.items() if n in _R1SET},
        "queries_count_eval": {
            n: s for n, s in compat.items() if n in _R1SET
        },
        # r14 addition: per-query MEDIAN-of-passes (noop eval) for the
        # frozen set — the noise-resistant twin of "queries" (min).
        # First to go under the size fail-safe below.
        "queries_median": {
            n: _median(s) for n, s in samples_noop.items() if n in _R1SET
        },
        "detail_file": "BENCH_DETAIL.json",
    }
    line = json.dumps(summary)
    if len(line) >= 1800:
        # fail SAFE: the driver parses the LAST stdout line, so an
        # oversized summary must shrink, never crash after printing
        # something longer (and assert vanishes under python -O)
        for k in ("queries_median", "queries_count_eval", "queries"):
            summary.pop(k, None)
            summary["truncated"] = True
            line = json.dumps(summary)
            if len(line) < 1800:
                break
    # the big per-query detail dict goes to stdout FIRST (sacrificial,
    # human eyes / tail-truncation fodder) and the bounded summary is
    # always the final line
    print(json.dumps(detail))
    print(line)


if __name__ == "__main__":
    main()
