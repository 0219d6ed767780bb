"""File-layout evidence for the r14 write_ivf_cells change (VERDICT
r13 ask #5): the seed write used to feed the map-only ``ivf_assign``
projection straight into ``partitionBy(cell)``, so every scan task
opened one output file per cell it touched — up to tasks x n_cells
small files. The r14 form hash-repartitions on the cell key first
(one write task per cell) and sorts within partitions by vec_id.

This script writes the SAME assignment both ways — the scan forced to
``n_tasks`` input partitions, the shape a multi-task cluster scan has
— and prints per-store parquet file counts plus a sorted-rows identity
check, so the claim "store contents identical, only file layout
changes" is reproducible.

Usage: python tools/evidence_ivf_layout.py [n_tasks] [sf_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    n_tasks = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from mapreduce_inverted_index_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        write_ivf_cells,
    )
    from mapreduce_inverted_index_spark.session import get_spark

    spark = get_spark(
        app_name="evidence-ivf-layout",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(emb, n_cells=16)
    # a 100 TB scan is thousands of tasks; emulate multi-task input
    assigned = ivf_assign(emb.repartition(n_tasks), cents)

    base = tempfile.mkdtemp(prefix="mii_ivf_layout_")
    old_dir = os.path.join(base, "old")
    new_dir = os.path.join(base, "new")

    # OLD (pre-b8b4a01): assignment straight into partitionBy(cell)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(old_dir)
    # NEW: the committed seed path (repartition(cell) + sortWithin)
    write_ivf_cells(assigned, new_dir)

    def count_files(d: str) -> tuple[int, dict[str, int]]:
        per_cell: dict[str, int] = {}
        for f in glob.glob(os.path.join(d, "cell=*", "*.parquet")):
            cell = os.path.basename(os.path.dirname(f))
            per_cell[cell] = per_cell.get(cell, 0) + 1
        return sum(per_cell.values()), per_cell

    n_old, pc_old = count_files(old_dir)
    n_new, pc_new = count_files(new_dir)
    print(f"input scan tasks: {n_tasks}, cells: {len(pc_old)}")
    print(
        f"OLD  (map-only partitionBy): {n_old} files "
        f"(per-cell max {max(pc_old.values())})"
    )
    print(
        f"NEW  (repartition+sortWithin): {n_new} files "
        f"(per-cell max {max(pc_new.values())})"
    )

    a = sorted(map(tuple, spark.read.parquet(old_dir).collect()))
    b = sorted(map(tuple, spark.read.parquet(new_dir).collect()))
    print(f"contents identical: {a == b} ({len(a)} rows)")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
