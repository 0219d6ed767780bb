"""Differential-oracle comparator mimicking the driver's check:
row-count + schema-shape + order-insensitive value hash, PySpark vs
DuckDB on the same parquet tables.

Stricter-or-equal to the driver: exact value equality after
canonicalization (column sort by name, row sort, stable string
rendering). If this passes, the driver's hash comparison should too.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mapreduce_inverted_index_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, float):
        if v == 0.0:
            v = 0.0  # collapse -0.0: the f-string would keep the sign
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return repr(v)
    if hasattr(v, "isoformat"):  # datetime/date/pd.Timestamp
        return v.isoformat()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(
            f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        )
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    s_rows, o_rows = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if s_rows != o_rows:
        diff_i = next(
            (i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b),
            min(len(s_rows), len(o_rows)) - 1,
        )
        problems.append(
            "values differ; first divergent sorted row "
            f"#{diff_i}:\n  spark : {s_rows[diff_i] if diff_i < len(s_rows) else '<none>'}"
            f"\n  oracle: {o_rows[diff_i] if diff_i < len(o_rows) else '<none>'}"
            f"\n  (cols: {s_cols})"
        )
    return problems
