"""Incremental corpus ingestion — the S1 "source walker" re-expressed
as a checkpointed file stream.

The reference's master walks paginated category listings and hands
each new batch of URLs to mappers (``master/src/master.py:48-86``):
state = "which pages have I already seen". The Spark-native analog is
a file-stream source over a growing directory with a checkpoint: each
``Trigger.AvailableNow`` run ingests exactly the files that arrived
since the last run, exactly once — the checkpoint IS the walker's
cursor, fault-tolerant and restartable for free.

At 100 TB this is the standing ingestion pattern: drop new corpus
shards into a landing directory (or Kafka topic — same downstream
code), run the ingest on a schedule or continuously, and every
downstream operator reads the growing canonical table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["stream_text_corpus", "ingest_available_now"]


def stream_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Unbounded analog of ``sources.formats.read_text_corpus``: one
    row per newly-arrived text file, ``(source STRING, text STRING)``.
    (Stable doc_ids for streamed docs come from content/provenance —
    e.g. ``xxhash64(source)`` — not a global counter, which can't
    exist on an unbounded stream.)"""
    return (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(path)
        .select(
            F.input_file_name().alias("source"),
            F.col("value").alias("text"),
        )
    )


def ingest_available_now(
    stream: DataFrame, sink_path: str, checkpoint_path: str
) -> None:
    """Run one AvailableNow ingestion pass: append every not-yet-seen
    file to the Parquet sink and advance the checkpoint cursor.
    Re-running after new files arrive ingests ONLY the new files;
    re-running with nothing new is a no-op (exactly-once per file).
    """
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
