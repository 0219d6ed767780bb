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

__all__ = ["write_json", "read_json", "write_csv", "read_csv"]


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
