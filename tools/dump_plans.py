"""Dump ``.explain("formatted")`` for named catalog queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [name ...]

Writes ``OUTDIR/<name>_<SUFFIX>.txt`` for each query (default: the
full bench HEADLINE set). The optimization rounds commit these so
plan-shape claims (Exchange counts, join strategies, PushedFilters)
are reviewable without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mapreduce_inverted_index_spark.plans.registry import all_queries
from mapreduce_inverted_index_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: dump_plans.py OUTDIR SUFFIX [name ...]")
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    cat = all_queries()
    for name in names:
        q = cat.get(name)
        if q is None:
            print(f"  {name}: NOT IN CATALOG", flush=True)
            continue
        df = q.fn(spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"  {name}: {len(plan)} chars, {n_ex} Exchange -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
