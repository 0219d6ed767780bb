"""sf1 per-query bench — the TIMING twin of the r11 sf1 correctness
sweep (VERDICT r11 ask #1).

Times the 46-query bench HEADLINE set plus a ~20-query supplement of
the heaviest production queries at BOTH sf0.1 (the per-round bench
scale) and sf1 (testdata_sf1, one decade up: 6M lineitem / 50k docs /
20k embeddings), same methodology as bench.py (noop-full eval,
min-of-2 cold-cache passes, host calibration recorded). Emits

  * SF1_BENCH_r12.json — per-query {sf0.1 sec, sf1 sec, ratio}
  * a markdown ratio table on stdout (paste into SCALING.md)

and flags any query whose sf1/sf0.1 ratio exceeds RATIO_FLAG — data
grows ~10x between the scales, so a materially super-10x ratio is the
timing signature of the input-sized-planning / skew / spill traps
that correctness sweeps can't see (the r11 `bounded_block_join` AQE
coalescing trap is the precedent: correct output, 60+ min
single-threaded).

Usage: python tools/bench_sf1.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import HEADLINE  # noqa: E402  (frozen bench set)

from mapreduce_inverted_index_spark.plans.registry import all_queries  # noqa: E402
from mapreduce_inverted_index_spark.session import get_spark  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_BASE", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/testdata_sf1")
RATIO_FLAG = 15.0
PASSES = 2
# Optional overrides for spot-probes (e.g. the r13 decade-2 run:
# SPARK_GRAFT_SF_BASE=testdata_sf1 SPARK_GRAFT_SF1_DIR=testdata_sf10
# MII_BENCH_ONLY=a,b,c MII_BENCH_OUT=SF10_TAIL_r13.json)
ONLY = tuple(x for x in os.environ.get("MII_BENCH_ONLY", "").split(",") if x)
OUT_NAME = os.environ.get("MII_BENCH_OUT", "SF1_BENCH_r13.json")

# Heaviest production queries NOT already in HEADLINE — the sf1
# sweep's big-output tail (2.37M-edge graph derivation, the 1.5M-row
# window trio, the full-corpus math map), the dedup/hygiene family's
# remaining members, and the round-12 substring-dedup operator.
SUPPLEMENT = (
    "user_cooccurrence_edges",
    "window_running_customer_spend",
    "window_order_gaps",
    "time_range_window_orders",
    "math_funcs_lineitem",
    "dedup_components",
    "ngram_jaccard_pairs",
    "common_passages",
    "duplicate_spans_docs",
    "benchmark_decontamination",
    "simhash_near_dup",
    "exact_dedup_docs",
    "doc_fingerprints",
    "pack_training_sequences",
    "stratified_sample_mixture",
    "pii_redaction_stats",
    "corpus_shuffle_order",
    "index_stats",
    "lm_quality_scores",
    "dedup_keep_best",
)


def main() -> None:
    spark = get_spark(
        app_name="mii-bench-sf1",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    queries = all_queries()

    from mapreduce_inverted_index_spark.plans.queries_llm import (
        reset_shared_cache,
    )

    def clear_state() -> None:
        reset_shared_cache()
        spark.catalog.clearCache()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def best_of(fn) -> float:
        best = float("inf")
        for _ in range(PASSES):
            clear_state()
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # host calibration, same job as bench.py (see its comment)
    def _calibration_job() -> None:
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "pmod(xxhash64(id), 100000) AS h"
        ).selectExpr("sum(h) AS s", "avg(h) AS a", "count(*) AS c").collect()

    _calibration_job()
    calibration = round(
        min(
            (lambda t0: (_calibration_job(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(3)
        ),
        3,
    )

    names = list(ONLY) or list(dict.fromkeys(tuple(HEADLINE) + SUPPLEMENT))
    run(queries["inverted_index"].fn(spark, SF01))  # warmup

    out: dict = {}
    for name in names:
        q = queries.get(name)
        if q is None:
            print(f"  (skip: {name} not in catalog)", flush=True)
            continue
        t01 = best_of(lambda: run(q.fn(spark, SF01)))
        t1 = best_of(lambda: run(q.fn(spark, SF1)))
        ratio = round(t1 / t01, 2) if t01 > 0 else None
        out[name] = {
            "sf0_1_sec": t01,
            "sf1_sec": t1,
            "ratio": ratio,
            "scale_class": q.scale_class,
        }
        print(f"  {name}: {t01:.2f}s -> {t1:.2f}s ({ratio}x)", flush=True)

    flagged = {
        n: v for n, v in out.items()
        if v["ratio"] is not None and v["ratio"] > RATIO_FLAG
    }
    artifact = {
        "sf_base": SF01,
        "sf_target": SF1,
        "data_growth_x": 10,
        "ratio_flag_threshold": RATIO_FLAG,
        "passes": PASSES,
        "calibration_sec": calibration,
        "n_queries": len(out),
        "n_flagged": len(flagged),
        "flagged": sorted(flagged),
        "queries": out,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        OUT_NAME,
    )
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\nwrote {path}")

    print("\n### sf1 per-query bench (generated by tools/bench_sf1.py)\n")
    print(f"min-of-{PASSES} cold-cache noop-full seconds; data grows ~10x "
          f"sf0.1 -> sf1; calibration {calibration}s.\n")
    print("| query | sf0.1 | sf1 | sf1/sf0.1 |")
    print("|---|---|---|---|")
    for n, v in sorted(out.items(), key=lambda kv: -(kv[1]["ratio"] or 0)):
        mark = " **FLAG**" if n in flagged else ""
        print(f"| {n} | {v['sf0_1_sec']}s | {v['sf1_sec']}s "
              f"| {v['ratio']}x{mark} |")
    print(f"\nflagged (> {RATIO_FLAG}x): {sorted(flagged) or 'none'}")


if __name__ == "__main__":
    main()
