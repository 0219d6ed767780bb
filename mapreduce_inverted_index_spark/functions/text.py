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

__all__ = [
    "STOPWORDS",
    "normalize_text",
    "tokenize",
    "terms",
    "python_terms",
    "stopwords_sql_list",
    "strip_html",
    "sql_strip_html",
]


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


# The stopword list as ONE SQL array literal, parsed JVM-side in a
# single call. Building it as Column ops (``isin(*STOPWORDS)`` /
# ``F.lit(list)``) marshalled one py4j round-trip per word per terms()
# call — r13 profiled ~1.2 s of pure plan-construction time per
# signature build from this line alone (and terms() underlies every
# tokenize-family query). Words are double-quoted: they are ascii
# lowercase (some with apostrophes), never with double quotes.
_STOP_ARRAY_SQL = "array(" + ",".join(f'"{w}"' for w in STOPWORDS) + ")"


def terms(col: Column | str, *, keep_duplicates: bool = False) -> Column:
    """P1-P4 (+ optionally P5): stopword-filtered token array.

    ``keep_duplicates=False`` additionally applies the reference's
    per-document ``set()`` (P5, ``mapper/src/processor.py:190``) so
    each term appears once per document — the inverted-index input.
    ``keep_duplicates=True`` preserves term frequency for tf-idf /
    text-stats operators.
    """
    toks = tokenize(col)
    stop_arr = F.expr(_STOP_ARRAY_SQL)
    if keep_duplicates:
        return F.filter(toks, lambda t: ~F.array_contains(stop_arr, t))
    return F.array_except(toks, stop_arr)


def python_terms(text: str | None, *, keep_duplicates: bool = False) -> list[str]:
    """Pure-Python twin of :func:`terms` (P1-P4/P5) — the reference's
    row-at-a-time semantics verbatim (``mapper/src/processor.py:163-171``).

    Used by the UDTF API demo and by parity tests; the builtin
    column-expression path is the production pipeline. Python's ``re``
    treats ``\\x1c-\\x1f`` as whitespace where Java/(?U) does not — the
    one documented residual divergence (see :func:`normalize_text`);
    identical on any ASCII corpus.
    """
    import re

    if text is None:
        return []
    toks = re.sub(r"[^a-z\s]", "", text.lower()).split()
    kept = [t for t in toks if t not in _STOPWORD_SET]
    if keep_duplicates:
        return kept
    return list(dict.fromkeys(kept))  # distinct, first-occurrence order


_STOPWORD_SET = frozenset(STOPWORDS)


# RE2 (DuckDB) has no unicode-aware \s flag; [\s\p{Z}\x{0085}] is the
# RE2 spelling of Java's (?U)\s (ASCII ws + separators + NEL).
_SQL_WS = r"[\s\p{Z}\x{0085}]"
_SQL_NOT_TOKEN = r"[^a-z\s\p{Z}\x{0085}]"


# --- S2 parity: HTML → text projection ------------------------------
#
# The reference's fetch step (``mapper/src/processor.py:146-155``)
# takes ``div#mw-content-text``, decomposes ``table``/``script``/
# ``style`` subtrees, and joins the remaining text nodes with " ".
# This is that projection as a builtin regexp cascade — identical
# pattern text runs on Java regex (Spark, whole-stage codegen) and
# RE2 (DuckDB oracle), so the operator is differentially checkable
# and never leaves the JVM.
#
# Honest limits vs a real parser (documented, golden-tested):
#   * the content-div subtree is approximated as "opening tag → LAST
#     </div>" (regexes can't balance tags); exact when the content
#     div is the page's final closing div, as on the reference's
#     Wikipedia pages;
#   * a dropped tag nested inside ITSELF (table-in-table) ends at the
#     first closing tag — one nesting level leaks its tail text.
# At 100 TB scale the same contract holds: this is a narrow map-stage
# projection with zero shuffle impact.

_HTML_DROP_TAGS = ("script", "style", "table")

# (pattern, replacement), applied in order. Subtree drops run before
# comment removal (their bodies may contain '<!--'), comments before
# the generic tag strip. Replacement is a space = BeautifulSoup's
# ``get_text(separator=" ")``.
_HTML_TAG_STEPS: tuple[tuple[str, str], ...] = tuple(
    [
        (rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", " ")
        for tag in _HTML_DROP_TAGS
    ]
    + [
        (r"(?s)<!--.*?-->", " "),  # comment nodes have no text
        (r"(?s)<[^>]*>", " "),  # every remaining tag → separator
    ]
)

# Minimal entity set; '&amp;' must come last or it would re-create
# decodable entities ('&amp;lt;' → '&lt;' → '<').
_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def _div_pattern(content_div_id: str) -> str:
    return (
        rf"(?is)<div[^>]*\bid\s*=\s*[\"']?{content_div_id}[\"']?[^>]*>(.*)</div>"
    )


def strip_html(col: Column | str, *, content_div_id: str | None = None) -> Column:
    """HTML → whitespace-normalized text (the reference's S2 fetch
    projection). With ``content_div_id``, text outside that div is
    dropped and a page without the div yields ``''`` (reference
    parity: "no content div" → empty document).
    """
    c = F.col(col) if isinstance(col, str) else col
    if content_div_id is not None:
        c = F.regexp_extract(c, _div_pattern(content_div_id), 1)
    for pat, rep in _HTML_TAG_STEPS:
        c = F.regexp_replace(c, pat, rep)
    for search, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(search), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"(?U)\s+", " "))


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_strip_html(text_expr: str, *, content_div_id: str | None = None) -> str:
    """DuckDB twin of :func:`strip_html` — same cascade, RE2 flavor."""
    e = text_expr
    if content_div_id is not None:
        e = f"regexp_extract({e}, {_sql_str(_div_pattern(content_div_id))}, 1)"
    for pat, rep in _HTML_TAG_STEPS:
        e = f"regexp_replace({e}, {_sql_str(pat)}, {_sql_str(rep)}, 'g')"
    for search, rep in _HTML_ENTITIES:
        e = f"replace({e}, {_sql_str(search)}, {_sql_str(rep)})"
    return f"trim(regexp_replace({e}, '{_SQL_WS}+', ' ', 'g'))"


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
