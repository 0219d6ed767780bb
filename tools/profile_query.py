"""Stage-level profile of a declared query via the Spark UI REST API —
the r13 measurement protocol (wall seconds on this host are noise; the
executor task/CPU times and the stage list are not).

Runs the named query N times through the noop sink (cold cache per
pass, same discipline as bench.py), then dumps every completed stage's
name, task time, executor CPU time, shuffle bytes and row counts.

Usage:  python tools/profile_query.py <query_name> [passes] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    name = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from mapreduce_inverted_index_spark.plans.registry import all_queries
    from mapreduce_inverted_index_spark.plans.queries_llm import (
        reset_shared_cache,
    )
    from mapreduce_inverted_index_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    q = all_queries()[name]
    sc = spark.sparkContext

    for i in range(passes):
        reset_shared_cache()
        spark.catalog.clearCache()
        sc.setJobDescription(f"{name} pass {i}")
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"pass {i}: {time.perf_counter() - t0:.3f}s")
        sc.setJobDescription(None)

    ui = sc.uiWebUrl
    app_id = sc.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    total_task = total_cpu = 0
    rows = []
    for s in stages:
        if s.get("status") != "COMPLETE":
            continue
        task_ms = s.get("executorRunTime", 0)
        cpu_ms = s.get("executorCpuTime", 0) / 1e6  # ns -> ms
        total_task += task_ms
        total_cpu += cpu_ms
        rows.append(
            (
                task_ms,
                cpu_ms,
                s.get("stageId"),
                s.get("numTasks"),
                s.get("inputRecords", 0),
                s.get("shuffleReadBytes", 0),
                s.get("shuffleWriteBytes", 0),
                (s.get("description") or s.get("name", ""))[:110],
            )
        )
    rows.sort(reverse=True)
    print(
        f"\n{'taskMs':>8} {'cpuMs':>8} {'stage':>5} {'tasks':>5} "
        f"{'inRows':>9} {'shRead':>9} {'shWrite':>9}  name"
    )
    for r in rows[:40]:
        print(
            f"{r[0]:>8.0f} {r[1]:>8.0f} {r[2]:>5} {r[3]:>5} "
            f"{r[4]:>9} {r[5]:>9} {r[6]:>9}  {r[7]}"
        )
    print(
        f"\nTOTAL task time {total_task/1000.0:.2f}s, "
        f"CPU {total_cpu/1000.0:.2f}s over {len(rows)} completed stages "
        f"({passes} passes)"
    )


if __name__ == "__main__":
    main()
