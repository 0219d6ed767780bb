"""Scalar / array column functions (all builtin-expression based)."""

from mapreduce_inverted_index_spark.functions.text import (
    STOPWORDS,
    normalize_text,
    terms,
    tokenize,
)
from mapreduce_inverted_index_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "STOPWORDS",
    "normalize_text",
    "tokenize",
    "terms",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
