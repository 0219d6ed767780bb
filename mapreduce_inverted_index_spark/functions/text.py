"""Text-normalization column functions — the reference's tokenize
pipeline (P1-P4 in SURVEY.md §2.3) as pure builtin Spark expressions.

Reference semantics reproduced exactly
(``mapper/src/processor.py:163-171``):

  1. lowercase                                   (P1, ``:166``)
  2. DELETE every char not in ``[a-z\\s]`` —
     punctuation/digits are removed, not split on:
     ``"don't rock-n-roll 42!"`` → ``dont rocknroll`` (P2, ``:167``)
  3. split on whitespace                         (P3, ``:168``)
  4. drop NLTK English stopwords                 (P4, ``:169``)

Everything stays JVM-side (whole-stage codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.functions.stopwords import (
    STOPWORDS,
    stopwords_sql_list,
)

__all__ = ["STOPWORDS", "normalize_text", "tokenize", "terms", "stopwords_sql_list"]


def normalize_text(col: Column | str) -> Column:
    """P1+P2: lowercase, then delete every non ``[a-z\\s]`` char.

    ``(?U)`` makes Java's ``\\s`` match Unicode whitespace like
    Python's ``re`` does — without it, NBSP/em-space/ideographic
    space are *deleted* (gluing adjacent tokens) instead of acting
    as separators, diverging from the reference's Python semantics.
    (Residual known divergence: Python also treats ``\\x1c-\\x1f``
    as whitespace; Unicode — and therefore Java/RE2 — does not.)
    """
    return F.regexp_replace(F.lower(F.col(col) if isinstance(col, str) else col),
                            r"(?U)[^a-z\s]", "")


def tokenize(col: Column | str) -> Column:
    """P3: whitespace-split into ARRAY<STRING>, no empty tokens.

    Python's ``str.split()`` never yields empty strings; Spark's
    ``split`` yields them for leading/trailing/empty input, so drop
    empties after the split.
    """
    return F.array_remove(F.split(normalize_text(col), r"(?U)\s+"), "")


def terms(col: Column | str, *, keep_duplicates: bool = False) -> Column:
    """P1-P4 (+ optionally P5): stopword-filtered token array.

    ``keep_duplicates=False`` additionally applies the reference's
    per-document ``set()`` (P5, ``mapper/src/processor.py:190``) so
    each term appears once per document — the inverted-index input.
    ``keep_duplicates=True`` preserves term frequency for tf-idf /
    text-stats operators.
    """
    toks = tokenize(col)
    if keep_duplicates:
        return F.filter(toks, lambda t: ~t.isin(*STOPWORDS))
    return F.array_except(toks, F.lit(list(STOPWORDS)).cast("array<string>"))


# RE2 (DuckDB) has no unicode-aware \s flag; [\s\p{Z}\x{0085}] is the
# RE2 spelling of Java's (?U)\s (ASCII ws + separators + NEL).
_SQL_WS = r"[\s\p{Z}\x{0085}]"
_SQL_NOT_TOKEN = r"[^a-z\s\p{Z}\x{0085}]"


def sql_tokens(text_expr: str = "text") -> str:
    """DuckDB twin of :func:`tokenize` (no stopword filter)."""
    return (
        f"list_filter(string_split_regex(regexp_replace(lower({text_expr}), "
        f"'{_SQL_NOT_TOKEN}', '', 'g'), '{_SQL_WS}+'), t -> t <> '')"
    )


def sql_terms(text_expr: str = "text", *, distinct: bool = False) -> str:
    """DuckDB oracle twin of the tokenize pipeline: a list expression.

    Produces the same token list as :func:`terms` for the given SQL
    text expression (used inside ``unnest(...)`` by oracle queries).
    """
    base = (
        f"list_filter(string_split_regex(regexp_replace(lower({text_expr}), "
        f"'{_SQL_NOT_TOKEN}', '', 'g'), '{_SQL_WS}+'), "
        f"t -> t <> '' AND t NOT IN ({stopwords_sql_list()}))"
    )
    if distinct:
        return f"list_distinct({base})"
    return base
