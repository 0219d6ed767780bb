"""Golden semantics tests — the reference's edge cases as fixtures
(SURVEY.md §5.3, FIXTURES.md "Golden semantics fixtures").
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.functions.text import terms, tokenize
from mapreduce_inverted_index_spark.operators.inverted_index import build_index
from mapreduce_inverted_index_spark.operators.term_queries import (
    and_query,
    not_query,
    or_query,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)]
    )


def test_readme_worked_example(spark):
    """Readme.md:224-242 — 3 docs; stopwords 'the'/'and' drop out."""
    docs = _docs(spark, ["the cat sat", "the dog ran", "cat and dog played"])
    index = {
        r["term"]: r["postings"]
        for r in build_index(docs).collect()
    }
    assert index == {
        "cat": [0, 2],
        "sat": [0],
        "dog": [1, 2],
        "ran": [1],
        "played": [2],
    }


def test_tokenizer_deletes_never_splits(spark):
    """P2 regex [^a-z\\s] deletes chars (mapper/src/processor.py:167):
    "don't rock-n-roll 42!" -> dont, rocknroll."""
    df = spark.range(1).select(tokenize(F.lit("Don't Rock-n-Roll 42!")).alias("t"))
    assert df.collect()[0]["t"] == ["dont", "rocknroll"]


def test_stopword_filter_post_regex(spark):
    """Stopwords are applied to post-regex tokens; 'dont' (from
    "don't") is NOT an NLTK stopword, while 'the'/'is' are."""
    df = spark.range(1).select(terms(F.lit("the cat is here don't")).alias("t"))
    got = set(df.collect()[0]["t"])
    assert got == {"cat", "dont"}


def test_per_doc_distinct_one_posting(spark):
    """P5: repeated term in one doc -> a single posting
    (mapper/src/processor.py:190)."""
    docs = _docs(spark, ["cat cat cat dog"])
    index = {r["term"]: r["postings"] for r in build_index(docs).collect()}
    assert index["cat"] == [0]
    assert index["dog"] == [0]


def test_cross_partition_dedup_sorted(spark):
    """A1-A3: same (term, doc) from different partitions appears once;
    postings sorted by doc_id (reducer/src/processor.py:66-77)."""
    docs = _docs(spark, ["zebra", "zebra", "zebra"]).repartition(3)
    index = {r["term"]: r["postings"] for r in build_index(docs).collect()}
    assert index["zebra"] == [0, 1, 2]


def test_empty_doc_consumes_id_no_postings(spark):
    """Failed/empty docs keep their doc_id but emit nothing
    (mapper/src/processor.py:186-188)."""
    docs = _docs(spark, ["cat", "", "dog"])
    pairs = build_index(docs).select(F.explode("postings").alias("d")).distinct()
    assert {r["d"] for r in pairs.collect()} == {0, 2}


def test_boolean_queries(spark):
    docs = _docs(spark, ["cat dog", "cat", "dog", "fish"])
    assert {r["doc_id"] for r in and_query(docs, ["cat", "dog"]).collect()} == {0}
    assert {r["doc_id"] for r in or_query(docs, ["cat", "dog"]).collect()} == {0, 1, 2}
    assert {r["doc_id"] for r in not_query(docs, "cat", "dog").collect()} == {1}


def test_phrase_query_basic_and_multi_occurrence(spark):
    from mapreduce_inverted_index_spark.operators.term_queries import phrase_query

    docs = _docs(spark, [
        "big red fox jumps",            # 0: match once
        "red big fox",                  # 1: words present, wrong order
        "big red big red fox",          # 2: "big red" twice
        "nothing here",                 # 3
    ])
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_query(docs, ["big", "red"]).collect()}
    assert got == {0: 1, 2: 2}


def test_phrase_query_three_words_and_duplicate_word(spark):
    from mapreduce_inverted_index_spark.operators.term_queries import phrase_query

    docs = _docs(spark, [
        "to be or not to be",       # "to be" twice; "be or not" once
        "be to be to",              # "to be" once (positions 1-2)
    ])
    got2 = {r["doc_id"]: r["n_occurrences"]
            for r in phrase_query(docs, ["to", "be"]).collect()}
    assert got2 == {0: 2, 1: 1}
    got3 = {r["doc_id"]: r["n_occurrences"]
            for r in phrase_query(docs, ["be", "or", "not"]).collect()}
    assert got3 == {0: 1}
    # duplicate word in the phrase: overlapping self-match must not fire
    gotdup = {r["doc_id"]: r["n_occurrences"]
              for r in phrase_query(docs, ["be", "to", "be"]).collect()}
    assert gotdup == {1: 1}


def test_bm25_prefers_matching_doc_and_caps_k(spark):
    from mapreduce_inverted_index_spark.operators.term_queries import bm25_rank

    docs = _docs(spark, [
        "fox fox fox den",
        "fox den",
        "den den den",
        "unrelated words entirely",
    ])
    rows = bm25_rank(docs, ["fox"], k=2).collect()
    assert len(rows) == 2
    assert rows[0]["doc_id"] == 0 and rows[1]["doc_id"] == 1
    assert rows[0]["bm25"] > rows[1]["bm25"] > 0
