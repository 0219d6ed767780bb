"""Dense-vector column functions over ``ARRAY<FLOAT/DOUBLE>`` columns.

Built on ``F.zip_with`` / ``F.aggregate`` so the arithmetic stays in
the JVM (no Python round-trip) — the hot path for the similarity
operators in ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine_similarity"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array columns (DOUBLE)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array column (DOUBLE)."""
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0),
                    lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)
