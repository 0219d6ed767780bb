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


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Raw-document ingestion: one row per text FILE (not per line),
    ``(doc_id BIGINT, source STRING, text STRING)``.

    The engine analog of the reference's fetch-per-URL source
    (``mapper/src/processor.py:135-161``): each file is one document,
    its path the provenance. doc_ids come from a ``row_number`` over
    the file path — stable across reruns because paths are unique and
    totally ordered. For 100 TB corpora prefer
    ``operators.ids.assign_partition_ids`` (no single-partition
    window); the ordered ids here mirror the reference's
    deterministic, dense assignment (``master/src/coordinator.py:57``).
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
    w = Window.orderBy("source")
    return files.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("doc_id"),
        "source",
        "text",
    )
