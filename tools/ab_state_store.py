"""Interleaved A/B: default (HDFS-backed) vs RocksDB state-store
provider for the stateful streaming operators (VERDICT r13 ask #4).

r12/r13 measured state-store instantiation as the dominant fixed cost
of the stateful queries at fixture scale (~1.5-2 s/query of micro-batch
machinery). The RocksDB provider changes that fixed cost (native store
instantiation per state partition per batch) and the at-scale story
(state larger than executor memory spills to local disk instead of
OOMing the HDFS-backed map). This script runs the r13 protocol: same
process, alternating provider, cold state each run (fresh checkpoint
per start — the memory sink + AvailableNow path already gives that),
min/median-of-N wall seconds, and a value-identity check between the
two providers.

Usage:  python tools/ab_state_store.py [n_pairs] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

PROV = "spark.sql.streaming.stateStore.providerClass"
ROCKS = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from mapreduce_inverted_index_spark.session import get_spark
    from mapreduce_inverted_index_spark.streaming.stateful import (
        stateful_transition_counts,
        stateful_user_peaks,
    )

    spark = get_spark(
        app_name="ab-state-store",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    ops = {
        "transition_counts": stateful_transition_counts,
        "user_peaks": stateful_user_peaks,
    }

    def run(op, provider: str | None) -> tuple[float, int]:
        if provider:
            spark.conf.set(PROV, provider)
        else:
            try:
                spark.conf.unset(PROV)
            except Exception:
                pass
        t0 = time.perf_counter()
        df = op(spark, sf_dir)
        n = df.count()
        return time.perf_counter() - t0, n

    # value identity first (one run per provider, sorted-rows compare)
    for name, op in ops.items():
        a = sorted(map(tuple, run_df(op, spark, sf_dir, None).collect()))
        b = sorted(map(tuple, run_df(op, spark, sf_dir, ROCKS).collect()))
        print(f"{name}: values_identical={a == b} rows={len(a)}")

    results: dict[str, dict[str, list[float]]] = {
        n: {"default": [], "rocksdb": []} for n in ops
    }
    for i in range(n_pairs):
        for name, op in ops.items():
            # alternate which provider goes first each pair
            order = (
                [("default", None), ("rocksdb", ROCKS)]
                if i % 2 == 0
                else [("rocksdb", ROCKS), ("default", None)]
            )
            for label, prov in order:
                dt, n = run(op, prov)
                results[name][label].append(round(dt, 3))
                print(f"pair {i} {name} {label}: {dt:.3f}s rows={n}")
    for name, r in results.items():
        for label, xs in r.items():
            xs2 = sorted(xs)
            print(
                f"SUMMARY {name} {label}: min={xs2[0]:.3f} "
                f"median={xs2[len(xs2)//2]:.3f} all={xs}"
            )


def run_df(op, spark, sf_dir, provider):
    if provider:
        spark.conf.set(PROV, provider)
    else:
        try:
            spark.conf.unset(PROV)
        except Exception:
            pass
    return op(spark, sf_dir)


if __name__ == "__main__":
    main()
