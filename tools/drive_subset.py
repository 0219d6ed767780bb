"""Run the driver-style differential for a named subset of catalog
queries (default: the current _DRIVER_PRIORITY window) at a given SF.

Usage: python tools/drive_subset.py [--rows-only] [--scaled]
           [--json OUT] [sf_dir] [name ...]

--json OUT writes the per-query result dict to OUT as JSON (the
per-round sweep artifacts, e.g. SF1_SWEEP_r*.json).

--rows-only skips the DuckDB oracle and records the Spark row count
only — for sweeps at scales where a query's NAIVE oracle is
super-linear (e.g. the recursive label-propagation components CTE on
a dense duplicate graph) while the engine side is not.

--scaled prefers a query's SCALE-CAPABLE oracle twin
(``Query.oracle_scaled`` — pinned equal to the naive oracle at
fixture scale by tests/test_scaled_oracles.py) where one exists, so
decade sweeps get exact-value checks instead of rows-only.
"""
import sys

sys.path.insert(0, "/root/repo")
import duckdb

from mapreduce_inverted_index_spark.plans.registry import (
    _DRIVER_PRIORITY,
    all_queries,
)
from mapreduce_inverted_index_spark.session import get_spark

argv = [a for a in sys.argv[1:] if a not in ("--rows-only", "--scaled")]
ROWS_ONLY = "--rows-only" in sys.argv
SCALED = "--scaled" in sys.argv
JSON_OUT = None
if "--json" in argv:
    i = argv.index("--json")
    if i + 1 >= len(argv):
        sys.exit("--json requires an output path argument")
    JSON_OUT = argv[i + 1]
    del argv[i:i + 2]
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
record: dict = {}
for name in names:
    q = cat.get(name)
    if q is None:
        skipped.append(name)
        continue
    try:
        sdf = q.fn(spark, SF).toPandas()
        oracle = (q.oracle_scaled if SCALED else None) or q.oracle
        if oracle is None or ROWS_ONLY:
            print(f"  {name}: rows-only, {len(sdf)} rows", flush=True)
            record[name] = {"rows": len(sdf), "check": "rows-only"}
            ok += 1
            continue
        opdf = con.execute(oracle).df()
        cols_s, cols_o = sorted(sdf.columns), sorted(opdf.columns)
        sv = sorted(map(str, sdf[cols_s].itertuples(index=False, name=None)))
        ov = sorted(map(str, opdf[cols_o].itertuples(index=False, name=None)))
        match = len(sdf) == len(opdf) and cols_s == cols_o and sv == ov
        print(
            f"  {name}: rows {len(sdf)} vs {len(opdf)}, "
            f"cols={cols_s == cols_o}, vals={sv == ov}",
            flush=True,
        )
        record[name] = {
            "rows": len(sdf), "oracle_rows": len(opdf),
            "cols_match": cols_s == cols_o, "vals_match": sv == ov,
            "check": "scaled-oracle" if (SCALED and q.oracle_scaled)
                     else "oracle",
        }
        if match:
            ok += 1
        else:
            bad.append(name)
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: ERROR {type(e).__name__}: {e}", flush=True)
        record[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
        bad.append(name)

print(f"SUBSET: {ok}/{len(names)} ok; bad={bad}; skipped={skipped}")
if JSON_OUT:
    import json as _json

    with open(JSON_OUT, "w") as f:
        _json.dump(
            {
                "sf_dir": SF,
                "scaled_oracles": SCALED,
                "n_queries": len(record),
                "n_ok": ok,
                "bad": bad,
                "queries": dict(sorted(record.items())),
            },
            f,
            indent=1,
        )
    print(f"wrote {JSON_OUT}")
