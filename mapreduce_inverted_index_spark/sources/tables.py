"""Table loaders over the engine's canonical Parquet layout.

The reference's sources are a live category crawl + per-URL HTML fetch
(S1/S2, ``master/src/master.py:48-86``, ``mapper/src/processor.py:135-161``);
the engine's source is a columnar ``documents`` table scan — Parquet
gives us predicate pushdown, column pruning, and split-based
parallelism for free, which is the whole point at 100 TB.

``load_table(spark, sf_dir, name)`` reads ``{sf_dir}/{name}.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The star schema + text/vector/event tables the driver materializes
# (TESTDATA.md). At production scale each would be a partitioned
# Parquet dataset or an external catalog table; the loader only
# assumes "directory of parquet per table".
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Lazy; Catalyst prunes columns/pushes filters."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # The fixtures store wall-time (non-UTC-adjusted) timestamps; pin
    # the session timezone so collected values render identically in
    # any host session (differential oracles compare wall times).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events.ts`` is a nanosecond parquet timestamp, which Spark's
    vectorized reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as
    INT64 and convert to a microsecond TIMESTAMP with *integer*
    division — a double division of epoch-nanos (~1.7e18) would lose
    ~256 ns to the 53-bit mantissa. The fixture's values are exact
    microseconds, so the conversion is lossless.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several tables at once → dict of lazy DataFrames."""
    wanted = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in wanted}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view so ``spark.sql`` works too."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
