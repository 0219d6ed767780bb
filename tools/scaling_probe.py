"""Weak-scaling probe: run representative queries at sf0.001 / 0.01 /
0.1 (100× input range) and report wall time per scale. Near-flat
normalized cost (sec per 100k lineitem-equivalent rows) is the
evidence that the plans scale by partitioning, not by luck.

Usage: python tools/scaling_probe.py [> SCALING.md]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mapreduce_inverted_index_spark.plans.registry import all_queries
from mapreduce_inverted_index_spark.session import get_spark

SFS = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
]

QUERIES = [
    "inverted_index",
    "agg_pricing_summary",
    "multiway_join_region_revenue",
    "minhash_near_dup",
    "window_topn_orders_per_segment",
    "stream_tumbling_counts",
    # round-5 additions: posting-list similarity join + sketch verify
    "tfidf_cosine_pairs",
    "frequent_bigrams",
    "stream_attribution_join",
    # round-6: unblocked PassJoin fuzzy matching + bucketed index tier
    "fuzzy_unblocked_pairs",
    "term_lookup_bucketed",
    # round-6: passage hygiene, graph, lakehouse write path
    "boilerplate_profile",
    "event_graph_triangles",
    "snapshot_merge_orders",
    # late round-6: RAG chunking (generator-heavy map) and the EWMA
    # window fold (collect_list state per row)
    "rag_chunk_docs",
    "ewma_user_values",
    # iterative fixed-point loop (5 join+agg rounds over the edges)
    # and the broadcast-vocab encode (explode + broadcast join +
    # ordered collect)
    "pagerank_user_graph",
    "vocab_token_ids",
    # final round-6: series densify+fill (spine join + fill window),
    # the Q21-shaped double-decorrelation, and canonical-keeper
    # selection over the dup-cluster graph
    "gap_fill_daily_user_values",
    "waiting_orders_suppliers",
    "dedup_keep_best",
    # closing session: the widest TPC-H join tree (Q7), the nested
    # Q20 decorrelation, the integer-matmul Gram reduction (cost is
    # O(N x d) Arrow decode + O(partitions x d^2) shuffle), the
    # chained funnel agg-joins, and the CMS partial-merge build
    "volume_shipping_nation_pairs",
    "excess_shipped_part_suppliers",
    "embedding_gram_matrix",
    "event_funnel_conversion",
    "cms_user_counts",
    # continuation session: frontier BFS (per-round cost tracks
    # frontier out-degree, not graph size), the sort-based skyline
    # (growth should track the groupBy scan — the window is over the
    # distinct-date axis only), and the one-pass Hellinger groupBy
    "graph_bfs_levels",
    "skyline_orders",
    "source_token_hellinger",
    # second batch: the distributed-prefix-sum family (sweep-line
    # concurrency; exact AUC) — growth should track the one
    # full-data groupBy, the prefix windows run per-bucket
    "peak_concurrent_sessions",
    "embedding_dim_auc",
    # closing batch: transition lag+rollup, rank-block Gini, and the
    # composed mixture dashboard (persisted scan, two rollups)
    "event_transition_matrix",
    "customer_revenue_gini",
    "source_mixture_report",
    # continuation-session-2: the two manual join-strategy ops —
    # salted skew join (census + split + 8x hot replication) and the
    # keyless grid-bucketed band join (pair count itself grows ~n^2/
    # span at fixed band, so growth tracks OUTPUT, not the plan)
    "salted_skew_join_events",
    "keyless_band_pairs_events",
    # the classifier gate (broadcast weight join + partial-agg
    # margin sum) and the Heaps curve (groupBy(term) novelty + two
    # bucketed prefix sums — growth should track the explode scan)
    "quality_classifier_margins",
    "vocab_growth_curve",
    # 32 replicates as bit-guarded conditional aggs in ONE pass —
    # the ~2s base is plan analysis of the 66-expression aggregate
    # (a per-QUERY constant; the data term is the md5+conv scan).
    # History: an explode-then-groupBy draft measured 20s/36.7x at
    # sf0.1 (n_reps x the corpus streamed into the aggregation, one
    # md5 per (row, replicate)); hashing once per row and folding
    # the replicate axis into conditional sums brought it to
    # ~3.4s/1.5x.
    "bootstrap_ci_price",
    # round-7: DSIR importance weights (two bounded histograms +
    # broadcast dim + one (doc,bucket) shuffle — growth should track
    # the token-explode scan) and the census-routed join (adds two
    # tiny planning jobs — bounded right-side probe + key-histogram
    # max — on top of the salted join it dispatches to here)
    "dsir_importance_weights",
    "auto_routed_join_events",
    # round-7 second batch: batch-vs-stored-state incremental dedup
    # (growth tracks batch signatures + the band join against state;
    # the probe's cost INCLUDES writing the state, so treat it as an
    # upper bound), the 8-replace BPE encode (pure scan-side chain +
    # one symbol agg), and the pushdown prefix probe over the stored
    # index (cost includes building the index tables per run)
    "minhash_incremental_dedup",
    "bpe_encode_docs",
    "prefix_query_index",
    # KMV sketch build + pairwise set-op estimates (distinct +
    # bounded window; pair math on |types| sketch rows)
    "kmv_user_overlap",
    # round-8: the 8-round BPE trainer (per-round cost is one
    # pair-count pass over the DISTINCT-token table — growth should
    # track vocabulary, which Heaps' law keeps sublinear in corpus
    # size), the IVF-backed hard-negative miner (cost INCLUDES the
    # codebook build + cell-store write per run, so treat it as an
    # upper bound on the probe), and the two-pass stream-maintained
    # semantic dedup state (cost includes two full AvailableNow
    # micro-batch cycles + state verification joins)
    "bpe_train_merges",
    "hard_negatives_ivf_contract",
    "semantic_stream_maintenance",
    # late round-8: the vocabulary^2-bounded bigram LM (growth should
    # track the token-explode scan; the LM table broadcast is
    # corpus-size-invariant), the two-pass streaming takedown fold
    # (round 9: bucketed store — cost includes the store build, but
    # each fold now rewrites only the affected bucket dirs), and
    # the quantized two-stage ANN re-rank
    "lm_bigram_quality_scores",
    "stream_takedown_queue",
    "ann_quantized_rerank_topk",
    # round-9: the doc-keyed co-located bucket pair (the pid-keyed
    # table guard means the bucketed build is paid ONCE per process —
    # exactly the tier's contract — so steady-state passes measure
    # the zero-Exchange join alone; see the sub-0.1 s rows)
    "colocated_doc_tf_norm",
]

# Pinned findings worth keeping next to the table (re-measured when
# the relevant operator changes).
NOTES = """
Notes:
- stream_attribution_join's cost is dominated by state-store
  instantiation, not data: stream-stream joins keep TWO buffer
  stores per shuffle partition per micro-batch. Measured at sf0.1:
  8 partitions -> 6.1 s, 4 -> 3.5 s, 2 -> 4.0 s, 16 -> 5.9 s, while
  the two file-stream source scans cost only ~2 s combined — hence
  JOIN_STATE_PARTITIONS = 4 (streaming/windows.py). That ~3.5 s is
  the fixed floor at any sf; data volume contributes almost nothing
  across the 100x probe range.
- term_lookup_bucketed includes BUILDING the bucketed tier (two
  index writes) per run; the lookup itself is the zero-Exchange
  probe plan (PLANS.md) and is milliseconds of the total.
- agg_pricing_summary's ratio rose under the noop-sink eval because
  the probe now measures what count() used to prune: the six
  decimal-exact sum/avg expressions over all 6M lineitem rows at
  sf0.1. The work is a map-side partial aggregate (6 groups out per
  partition) — linear in input, embarrassingly parallel, shuffle
  carries 6 rows x partials — i.e. the growth term is the scan+agg
  itself, the part that scales with executors.
- pagerank_user_graph's 4.1x ratio tracks the GRAPH, not the input:
  co-occurrence edge count is Sum(|ctx|^2), so 100x events grow edges
  superlinearly, and the loop is 5 full passes over the edge list.
  The knob is the same one cooccurrence_edges documents (context
  width bounds block population); per-pass cost itself is three
  hash-planned ops, embarrassingly parallel in the edge partitions.
- runtime Bloom-filter join pruning is verified by
  tests/test_scale_patterns.py::test_runtime_bloom_filter_prunes_probe_side:
  with a selective dim-side filter, Catalyst injects might_contain()
  on the fact scan so pruned rows never reach the shuffle. The
  injection thresholds (10 GB probe-side scan) are above these
  fixtures, so the local bench never pays its build cost; at 100 TB
  it fires exactly where it wins.
- frequent_bigrams' growth term is the Arrow transfer of the
  exploded bigram stream into the per-partition Misra-Gries pass
  (the merge itself is vectorized value_counts/Series.add since r6;
  sf0.1 dropped 2.10 s -> ~1.4 s). That transfer is a narrow map —
  linear in input and embarrassingly parallel — while the sketch's
  WIRE contract (<= k candidate rows per partition, no full-key
  shuffle) is the part that decides 100 TB feasibility.
- embedding_gram_matrix's growth (the table's steepest) is the
  Arrow decode of N x d float arrays into the partial-matmul pass —
  linear in input, embarrassingly parallel, with a small fixed
  overhead that flatters the tiny scales; the shuffled state is
  O(partitions x d^2) cells at every sf (the part that matters at
  100 TB). pagerank's 4x is 5 fixed-point rounds of join+agg over
  an edge list that grows with sf — per-round cost is the probe.
- graph_bfs_levels' growth tracks the GRAPH (same Sum(|ctx|^2)
  edge-count term as pagerank) times 4 frontier rounds; per-round
  cost is one frontier-edges join + one anti-join, sized to the
  edge count (the pagerank shuffle-window discipline), so the
  2.3x at 100x data is per-round scan growth, not round count.
  skyline_orders is flat because the only full-data work is one
  partial-agg scan of orders; the window runs over the distinct
  date axis (~2.4k rows at every sf).
"""


def main() -> None:
    spark = get_spark(
        app_name="scaling-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    queries = all_queries()

    # noop-sink eval (NOT count()): Catalyst prunes columns through a
    # bare count, so map-only pipelines (rag_chunk_docs' slice+md5)
    # would collapse to a generator scan and the probe would measure
    # nothing — the same honesty fix bench.py made in round 2.
    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the JVM/codegen paths once at the smallest scale
    for name in QUERIES:
        run(queries[name].fn(spark, SFS[0][0]))

    print("# SCALING — weak-scaling probe (generated by tools/scaling_probe.py)")
    print()
    print("Wall seconds per query per scale factor (local[32]; input grows")
    print("100x from sf0.001 to sf0.1). The last column is the growth ratio")
    print("t(sf0.1)/t(sf0.001) — 100x data in far less than 100x time means")
    print("fixed per-query overhead still dominates and the data-dependent")
    print("cost scales with partition parallelism.")
    print()
    print("| query | sf0.001 | sf0.01 | sf0.1 | t(0.1)/t(0.001) |")
    print("|---|---|---|---|---|")
    # Min-of-2 per (query, sf): single-pass numbers mix first-run
    # codegen/JIT compile into the smallest scales and random jitter
    # into the ratios (measured: a 1.5 s steady-state query probing
    # at 3.0 s on its first pass), so ratios were noise-dominated.
    from mapreduce_inverted_index_spark.plans.queries_llm import (
        reset_shared_cache,
    )

    for name in QUERIES:
        ts = []
        for sf_dir, _ in SFS:
            best = float("inf")
            for _pass in range(2):
                reset_shared_cache()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                run(queries[name].fn(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        ratio = ts[-1] / ts[0] if ts[0] else float("nan")
        print(
            f"| {name} | {ts[0]:.2f}s | {ts[1]:.2f}s | {ts[2]:.2f}s | {ratio:.1f}x |"
        )
    print(NOTES)

    # Regeneration must not drop the stress-probe section (it did,
    # twice): carry the existing one forward verbatim so
    # `python tools/scaling_probe.py > SCALING.md` stays idempotent;
    # re-run tools/stress_probe.py separately to refresh its numbers.
    import os

    scaling_md = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
    try:
        with open(scaling_md) as f:
            prior = f.read()
        idx = prior.find("## Stress probe")
        if idx != -1:
            print()
            print(prior[idx:].rstrip())
    except FileNotFoundError:
        pass


if __name__ == "__main__":
    main()
