"""Source / sink layer (Parquet-first; JSON for parity checks)."""

from mapreduce_inverted_index_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
)

__all__ = ["TABLES", "load_table", "load_tables"]
