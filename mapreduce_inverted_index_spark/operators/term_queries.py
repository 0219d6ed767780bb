"""Query surface over the inverted index — the reference's implied IR
semantics (SURVEY.md §2.8: exact lookup, boolean AND/OR/NOT) plus
tf-idf ranking and top-k, realized as DataFrame operators.

The reference documents exact-term lookup → postings list
(``Readme.md:222-242``); boolean queries are postings
intersection/union/difference over that structure. Here both shapes
are supported:
  * array form — operate on the ``postings`` arrays of a built index
    (cheap when the index is materialized and term-pruned),
  * relational form — semi/anti-joins over the (doc_id, term) pairs
    (scales when postings lists themselves are huge; no giant arrays
    on a single row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.operators.inverted_index import doc_terms

__all__ = [
    "term_lookup",
    "and_query",
    "or_query",
    "not_query",
    "tf_idf",
    "top_k_terms",
]


def term_lookup(index: DataFrame, term: str) -> DataFrame:
    """Exact-term lookup (``Readme.md:222-242``). On a term-bucketed /
    sorted Parquet index this is a pruned scan, not a full pass."""
    return index.where(F.col("term") == term)


def and_query(docs: DataFrame, terms_wanted: list[str],
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Docs containing ALL the given terms (postings intersection).

    Relational form: filter pairs to the wanted terms, then require
    the distinct-term count per doc to equal ``len(terms_wanted)``.
    One narrow filter + one small-keyspace aggregate — no index
    materialization needed, and the filter prunes before any shuffle.
    """
    pairs = doc_terms(docs, text_col, id_col)
    return (
        pairs.where(F.col("term").isin(terms_wanted))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("n_matched"))
        .where(F.col("n_matched") == len(terms_wanted))
        .select("doc_id")
    )


def or_query(docs: DataFrame, terms_wanted: list[str],
             text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Docs containing ANY of the given terms (postings union)."""
    pairs = doc_terms(docs, text_col, id_col)
    return (
        pairs.where(F.col("term").isin(terms_wanted))
        .select("doc_id")
        .distinct()
    )


def not_query(docs: DataFrame, include_term: str, exclude_term: str,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Docs with ``include_term`` but NOT ``exclude_term``
    (postings difference) — a left-anti join on doc_id."""
    pairs = doc_terms(docs, text_col, id_col)
    inc = pairs.where(F.col("term") == include_term).select("doc_id")
    exc = pairs.where(F.col("term") == exclude_term).select("doc_id")
    return inc.join(exc, "doc_id", "left_anti")


def tf_idf(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
           round_to: int = 4) -> DataFrame:
    """tf-idf score per (doc_id, term).

    tf = raw in-doc term count (duplicates preserved through the
    tokenizer), idf = ln(N / df). N is a scalar aggregate broadcast
    into the expression; df comes from a groupBy over the pairs and
    joins back — both shuffles are on the term key and AQE will
    broadcast the df side when small. Score rounded so differential
    oracles compare stably across engines.
    """
    from mapreduce_inverted_index_spark.operators.inverted_index import doc_term_freq

    tf = doc_term_freq(docs, text_col, id_col)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    total = docs.agg(F.countDistinct(id_col).alias("n_docs"))
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), round_to)
             .alias("tfidf"),
        )
    )


def top_k_terms(docs: DataFrame, k: int = 25,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k terms by document frequency (ties broken by term) —
    sort + limit on an already-tiny aggregate, so the global sort is
    cheap regardless of corpus size."""
    from mapreduce_inverted_index_spark.operators.inverted_index import doc_freq

    return (
        doc_freq(docs, text_col, id_col)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )
