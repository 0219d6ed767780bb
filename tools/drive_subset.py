"""Run the driver-style differential for a named subset of catalog
queries (default: the current _DRIVER_PRIORITY window) at a given SF.

Usage: python tools/drive_subset.py [--rows-only] [sf_dir] [name ...]

--rows-only skips the DuckDB oracle and records the Spark row count
only — for sweeps at scales where a query's NAIVE oracle is
super-linear (e.g. the recursive label-propagation components CTE on
a dense duplicate graph) while the engine side is not.
"""
import sys

sys.path.insert(0, "/root/repo")
import duckdb

from mapreduce_inverted_index_spark.plans.registry import (
    _DRIVER_PRIORITY,
    all_queries,
)
from mapreduce_inverted_index_spark.session import get_spark

argv = [a for a in sys.argv[1:] if a != "--rows-only"]
ROWS_ONLY = "--rows-only" in sys.argv
SF = argv[0] if argv else "/root/testdata/sf0.01"
names = argv[1:] or list(_DRIVER_PRIORITY)

spark = get_spark(app_name="drive-subset")
cat = all_queries()
con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

ok, bad, skipped = 0, [], []
for name in names:
    q = cat.get(name)
    if q is None:
        skipped.append(name)
        continue
    try:
        sdf = q.fn(spark, SF).toPandas()
        if q.oracle is None or ROWS_ONLY:
            print(f"  {name}: rows-only, {len(sdf)} rows", flush=True)
            ok += 1
            continue
        opdf = con.execute(q.oracle).df()
        cols_s, cols_o = sorted(sdf.columns), sorted(opdf.columns)
        sv = sorted(map(str, sdf[cols_s].itertuples(index=False, name=None)))
        ov = sorted(map(str, opdf[cols_o].itertuples(index=False, name=None)))
        match = len(sdf) == len(opdf) and cols_s == cols_o and sv == ov
        print(
            f"  {name}: rows {len(sdf)} vs {len(opdf)}, "
            f"cols={cols_s == cols_o}, vals={sv == ov}",
            flush=True,
        )
        if match:
            ok += 1
        else:
            bad.append(name)
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: ERROR {type(e).__name__}: {e}", flush=True)
        bad.append(name)

print(f"SUBSET: {ok}/{len(names)} ok; bad={bad}; skipped={skipped}")
