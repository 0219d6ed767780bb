"""Mimic the driver: import __spark_entry__, smoke entry(), run every
queries()[name] at sf0.01 against oracle_sql()[name] via DuckDB."""
import sys
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as E
from mapreduce_inverted_index_spark.session import get_spark

spark = get_spark(app_name="verify-drive")

# 1. smoke: entry()
df = E.entry(spark)
rows = df.collect()
print(f"ENTRY: {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) > 0

# 2. differential at sf0.01 (driver's correctness scale)
SF = "/root/testdata/sf0.01"
qs, oracles = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
ok = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF).toPandas()
    if name not in oracles:
        print(f"  {name}: rows-only, {len(sdf)} rows")
        continue
    opdf = con.execute(oracles[name]).df()
    cols_s, cols_o = sorted(sdf.columns), sorted(opdf.columns)
    svals = sorted(map(str, sdf[cols_s].itertuples(index=False, name=None)))
    ovals = sorted(map(str, opdf[cols_o].itertuples(index=False, name=None)))
    match = len(sdf)==len(opdf) and cols_s==cols_o and svals==ovals
    print(f"  {name}: rows {len(sdf)} vs {len(opdf)}, cols_match={cols_s==cols_o}, values_match={svals==ovals}")
    assert match, name
    ok += 1
print(f"DIFFERENTIAL: {ok}/{len(oracles)} oracle queries match")
