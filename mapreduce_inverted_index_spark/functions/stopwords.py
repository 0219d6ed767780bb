"""The NLTK English stopword list, embedded as a constant.

The reference loads this set at runtime from NLTK data baked into its
Docker image and filters tokens against it
(``mapper/src/processor.py:23-32,169``). We embed the identical public
list so the engine has no runtime NLTK dependency (SURVEY.md §7.3.1).

Parity note: the reference applies this filter AFTER its
``[^a-z\\s]`` character strip, so tokens never contain apostrophes and
entries like ``don't`` can never match — they are kept verbatim anyway
so the set is byte-identical to NLTK's.
"""

from __future__ import annotations

# nltk.corpus.stopwords.words("english") — 179 entries.
STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself", "she",
    "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "that'll", "these", "those", "am",
    "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few",
    "more", "most", "other", "some", "such", "no", "nor", "not",
    "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've",
    "now", "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren",
    "aren't", "couldn", "couldn't", "didn", "didn't", "doesn",
    "doesn't", "hadn", "hadn't", "hasn", "hasn't", "haven", "haven't",
    "isn", "isn't", "ma", "mightn", "mightn't", "mustn", "mustn't",
    "needn", "needn't", "shan", "shan't", "shouldn", "shouldn't",
    "wasn", "wasn't", "weren", "weren't", "won", "won't", "wouldn",
    "wouldn't",
)


def stopwords_sql_list() -> str:
    """The stopword set as a SQL IN-list literal (for DuckDB oracles)."""
    return ", ".join("'" + w.replace("'", "''") + "'" for w in STOPWORDS)


def stopwords_spark_in_list() -> str:
    """The stopword set as a Spark-SQL IN-list literal (double-quoted:
    entries carry apostrophes, never double quotes — same convention as
    ``text._STOP_ARRAY_SQL``).

    For ``F.expr`` call sites: building the same predicate as Column
    ops (``col.isin(*STOPWORDS)``) marshals one py4j round-trip per
    word — 179 calls, ~0.4 s of plan-construction latency per call on
    the r13 measurement host. Parsed JVM-side this is ONE call, and
    Catalyst's OptimizeIn still rewrites the 179-literal In to the
    codegen'd hash-set InSet, so the executed plan is identical.
    """
    return ",".join('"' + w + '"' for w in STOPWORDS)
