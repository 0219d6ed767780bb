"""SparkSession factory with scale-oriented defaults.

The engine targets multi-executor clusters reading ~100 TB; tests run
on ``local[N]``. Every knob here is chosen so the *same* logical plans
survive a 1000x scale-up: AQE on (runtime coalesce + skew-join), Arrow
for any Pandas-UDF exchange, sane shuffle-partition default for local
runs (clusters override via ``spark.sql.shuffle.partitions`` or rely on
AQE's ``advisoryPartitionSizeInBytes``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # Adaptive execution: runtime partition coalescing, skew-join
    # splitting, and dynamic join-strategy switching. Essential at
    # scale; harmless locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batches for any pandas_udf / mapInPandas exchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Local-mode shuffle width; a real cluster sets this (or leaves
    # AQE to coalesce from a high initial value).
    "spark.sql.shuffle.partitions": "32",
    # local[*] runs driver+executors in ONE JVM: the 1g default heap
    # is what a 32-thread run gets in total, and runtime broadcasts
    # OOM'd the stress probe at 100k docs. Only applies at JVM start
    # (ignored on getOrCreate of a live session); clusters size
    # executors instead. Override via SPARK_GRAFT_DRIVER_MEM.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    # Keep timestamps straightforward for differential tests.
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "mii-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` resolution order: explicit arg > existing session >
    ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
