"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting, and document fingerprinting.

All pure builtin-expression code (codegen'd, no Python in the row
path), and all SQL-expressible — every operator here has a DuckDB
oracle twin, unlike the LSH family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.functions.stopwords import STOPWORDS
from mapreduce_inverted_index_spark.functions.text import normalize_text, terms, tokenize

__all__ = [
    "LANG_MARKERS",
    "language_id",
    "token_stats",
    "quality_profile",
    "fingerprints",
]

# Tiny embedded marker-word lists (top function words per language).
# A production language-ID model would be a char-n-gram classifier;
# the *operator shape* — per-language evidence counts → argmax with a
# deterministic tie-break — is identical, which is what the engine
# provides. Ordered dict: ties break toward the first entry.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "is", "of", "to", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr": ("le", "la", "les", "et", "des", "est", "une", "dans"),
}

# BPE-ish token pieces: letter runs, digit runs, single other symbols.
TOKEN_PIECE_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _marker_hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: per-language evidence counts and an
    argmax prediction ('und' — undetermined — when no marker hits).

    Output: ``doc_id, hits_de, hits_en, hits_es, hits_fr,
    pred_lang``. Tie-break: language code ascending (deterministic).
    """
    toks = tokenize(text_col)
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    hit_cols = {lang: _marker_hits(F.col("toks"), ws) for lang, ws in LANG_MARKERS.items()}
    out = d.select(
        "doc_id", *[c.alias(f"hits_{lang}") for lang, c in hit_cols.items()]
    )
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # insertion order = tie-break order
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return out.withColumn("pred_lang", pred)


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token-count profile per document.

    Output: ``doc_id, n_tokens`` (whitespace tokens), ``n_terms``
    (distinct non-stopword), ``n_pieces`` (BPE-ish regex pieces),
    ``est_bpe_tokens`` (chars/4 heuristic), ``stopword_ratio``,
    ``type_token_ratio`` (both rounded, NULL-safe for empty docs).
    """
    toks = tokenize(text_col)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        toks.alias("toks"),
        terms(text_col).alias("trm"),
    )
    n_tokens = F.size("toks")
    n_stop = F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS)))
    return d.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        F.size("trm").cast("int").alias("n_terms"),
        F.regexp_count(F.col("text"), F.lit(TOKEN_PIECE_REGEX)).cast("int").alias("n_pieces"),
        F.ceil(F.length("text") / 4.0).cast("int").alias("est_bpe_tokens"),
        F.when(n_tokens > 0, F.round(n_stop.cast("double") / n_tokens, 6)).alias("stopword_ratio"),
        F.when(
            n_tokens > 0,
            F.round(F.size(F.array_distinct("toks")).cast("double") / n_tokens, 6),
        ).alias("type_token_ratio"),
    )


def quality_profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0, 1] per document — the standard
    pre-training filter features (length band, mean word length,
    lexical diversity, alpha ratio) combined with fixed weights.

    Output: ``doc_id, n_chars_obs, mean_word_len, alpha_ratio,
    lex_diversity, quality_score, is_quality``.
    """
    toks = tokenize(text_col)
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"), toks.alias("toks")
    )
    n_tokens = F.size("toks")
    n_chars = F.length("text")
    alpha_chars = F.length(F.regexp_replace(F.col("text"), r"[^a-zA-Z]", ""))
    mean_wl = F.when(
        n_tokens > 0,
        F.round(F.aggregate("toks", F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_tokens, 6),
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, F.round(alpha_chars.cast("double") / n_chars, 6)).otherwise(F.lit(0.0))
    lex_div = F.when(
        n_tokens > 0,
        F.round(F.size(F.array_distinct("toks")).cast("double") / n_tokens, 6),
    ).otherwise(F.lit(0.0))
    len_band = (
        F.when((n_tokens >= 20) & (n_tokens <= 1000), F.lit(1.0))
        .when(n_tokens > 0, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    score = F.round(
        0.3 * len_band + 0.3 * alpha_ratio + 0.2 * lex_div
        + 0.2 * F.least(mean_wl / F.lit(8.0), F.lit(1.0)),
        6,
    )
    return d.select(
        "doc_id",
        n_chars.cast("int").alias("n_chars_obs"),
        mean_wl.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        lex_div.alias("lex_diversity"),
        score.alias("quality_score"),
        (score >= 0.6).alias("is_quality"),
    )


def fingerprints(docs: DataFrame, gram: int = 5, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: whole-content md5 + a shift-resistant
    char-n-gram min-hash (winnowing-style: the minimum md5 over all
    character 5-grams of the normalized text — stable under content
    reordering/prepending, unlike the whole-content hash).

    Output: ``doc_id, content_md5, min_gram_md5``.
    """
    norm = F.regexp_replace(F.trim(normalize_text(text_col)), r"\s+", " ")
    d = docs.select(F.col(id_col).alias("doc_id"), norm.alias("norm"))
    # n-grams via zip_with over shifted char slices — NOT
    # transform(sequence, i -> substring(norm, i, g)): an outer alias
    # referenced inside a lambda gets its defining expression inlined
    # and re-evaluated per element (see word_shingles).
    chars = F.split(F.col("norm"), "")
    m = F.greatest(F.length("norm") - (gram - 1), F.lit(0))
    acc = F.slice(chars, 1, m)
    for k in range(1, gram):
        acc = F.zip_with(acc, F.slice(chars, k + 1, m), lambda a, b: F.concat(a, b))
    grams = F.when(F.length("norm") >= gram, acc).otherwise(F.array(F.col("norm")))
    return d.select(
        "doc_id",
        F.md5("norm").alias("content_md5"),
        F.array_min(F.transform(grams, F.md5)).alias("min_gram_md5"),
    )
