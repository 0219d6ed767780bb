"""Format readers/writers beyond the canonical Parquet: JSON and CSV
with explicit schemas, plus the reference-parity JSON index sink.

The reference materializes every stage as pretty-printed JSON files
(``mapper/src/processor.py:68``, ``reducer/src/processor.py:90-113``).
The engine's canonical storage is partitioned Parquet; JSON/CSV exist
as interchange formats with schema-enforced reads (PERMISSIVE mode:
corrupt rows become nulls in ``_corrupt_record`` instead of failing
the job — the schematized version of the reference's log-and-skip,
``reducer/src/reducer.py:97-120``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = [
    "write_json",
    "read_json",
    "write_csv",
    "read_csv",
    "write_orc",
    "read_orc",
    "read_text_corpus",
    "read_evolved_parquet",
]


def write_json(df: DataFrame, path: str, *, single_file: bool = False) -> None:
    """JSON-lines sink. ``single_file`` coalesces to one part for
    small parity outputs ONLY — a 100 TB result is never one file."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-enforced JSON scan; malformed rows null out instead of
    failing (PERMISSIVE, the default)."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType, *, header: bool = True) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink — the second columnar interchange format (zlib by
    Spark default; columnar + predicate pushdown like Parquet)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; schema comes from the file footer (columnar formats
    are self-describing — no schema argument needed)."""
    return spark.read.orc(path)


def read_text_corpus(spark: SparkSession, path: str, *, dense: bool = False) -> DataFrame:
    """Raw-document ingestion: one row per text FILE (not per line),
    ``(doc_id BIGINT, source STRING, text STRING)``.

    The engine analog of the reference's fetch-per-URL source
    (``mapper/src/processor.py:135-161``): each file is one document,
    its path the provenance.

    doc_ids default to the SCALE-SAFE assignment
    (``operators.ids.assign_partition_ids``: per-partition offsets +
    local increment — the reference's actual ``doc_id_start``
    mechanism, ``master/src/coordinator.py:57``, with no
    single-partition stage anywhere in the plan). Ids are dense and
    unique; they follow Spark's file-split order.

    ``dense=True`` opts into the reference-parity global ordering
    (``row_number`` over the file path — stable across reruns because
    paths are unique and totally ordered) at the cost of funneling
    the final numbering through ONE task; reserve it for corpora
    small enough that a single task can see every row.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    files = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(path)
        .select(
            F.input_file_name().alias("source"),
            F.col("value").alias("text"),
        )
    )
    if not dense:
        from mapreduce_inverted_index_spark.operators.ids import assign_partition_ids

        tagged = assign_partition_ids(files, id_name="doc_id")
        return tagged.select("doc_id", "source", "text")
    w = Window.orderBy("source")
    return files.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("doc_id"),
        "source",
        "text",
    )


def read_evolved_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read over Parquet shards written at different
    times with different (compatible) schemas: the unified schema is
    the union of all shards' columns and rows missing a column read
    NULL — the lakehouse contract for tables that GAIN columns over
    their lifetime (a 100 TB corpus is never rewritten because one
    ingest added a `lang` tag).

    ``mergeSchema`` is off by default in Spark because footer-merging
    costs one footer read per file at planning time; turning it on
    per-read (here) rather than globally keeps that cost where it is
    paid for. Incompatible same-name types still fail loudly — this
    widens schemas, it does not cast them.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)
