"""Tokenizer parity: the Spark expression pipeline must reproduce the
reference's Python semantics (``mapper/src/processor.py:163-171``:
lower → delete [^a-z\\s] → str.split() → drop NLTK stopwords) for
adversarial inputs — unicode, digits, apostrophes, odd whitespace,
empty/huge strings. One Spark job for the whole corpus of cases.
"""

from __future__ import annotations

import re

from pyspark.sql import Row

from mapreduce_inverted_index_spark.functions.stopwords import STOPWORDS
from mapreduce_inverted_index_spark.functions.text import terms, tokenize

_STOP = set(STOPWORDS)


def _reference_tokenize(text: str) -> list[str]:
    """The reference pipeline, transcribed semantics (not code):
    P1 lower, P2 delete, P3 whitespace split."""
    text = text.lower()
    text = re.sub(r"[^a-z\s]", "", text)
    return text.split()


def _reference_terms(text: str) -> list[str]:
    return [t for t in _reference_tokenize(text) if t not in _STOP]


CASES = [
    "",
    " ",
    "\t\n  \r ",
    "Hello World",
    "don't rock-n-roll 42!",
    "l'été à Paris — café naïve",          # accents are DELETED, not mapped
    "ὕαλον φαγεῖν δύναμαι",                # entirely non-latin -> empty
    "中文文本 no latin here 漢字",
    "the and is of to in that it",          # all stopwords
    "THE CAT the cat ThE cAt",
    "a1b2c3 d4e5",
    "under_score snake-case dot.sep",
    "tab\tsep\nnewline\rcarriage",
    "  leading trailing  ",
    "répétition répétition",
    "emoji 😀 test ✨ done",
    "x" * 5000,
    ("word " * 500).strip(),
    "can't won't shouldn't ain't y'all",
    "T 5 % $ #",
    "mixedCASEtoken",
    "ends with stopword the",
    "ñandú über fiançée",
    "nbsp\u00a0separated\u00a0words",
    "em\u2003space and ideo\u3000space",
    "zero\u200bwidth stays glued",
    "nel\u0085separator",
]


def test_tokenize_and_terms_match_reference_semantics(spark):
    df = spark.createDataFrame(
        [Row(i=i, text=t) for i, t in enumerate(CASES)]
    )
    got = {
        r["i"]: (r["toks"], r["trm"])
        for r in df.select(
            "i",
            tokenize("text").alias("toks"),
            terms("text", keep_duplicates=True).alias("trm"),
        ).collect()
    }
    for i, text in enumerate(CASES):
        assert got[i][0] == _reference_tokenize(text), f"tokenize case {i}: {text[:40]!r}"
        assert got[i][1] == _reference_terms(text), f"terms case {i}: {text[:40]!r}"


def test_distinct_terms_match_reference(spark):
    df = spark.createDataFrame([Row(i=i, text=t) for i, t in enumerate(CASES)])
    got = {
        r["i"]: sorted(r["trm"])
        for r in df.select("i", terms("text").alias("trm")).collect()
    }
    for i, text in enumerate(CASES):
        assert got[i] == sorted(set(_reference_terms(text))), f"case {i}"


def _py_bpe(word: str, merges):
    """Reference greedy BPE: one left-to-right non-overlapping pass
    per merge, in learned order."""
    s = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def test_bpe_encode_matches_reference_greedy(spark):
    """The replace()-chain encode must equal the canonical per-word
    greedy BPE on every edge case: overlapping candidates (aaa),
    adjacent repeats (abab), multi-char second symbols, and the
    symbol-prefix trap (pair (a,b) must not eat the prefix of a
    previously merged 'bc' symbol)."""
    from mapreduce_inverted_index_spark.operators.textstats import bpe_encode

    merges = [("b", "c"), ("a", "b"), ("a", "a"), ("aa", "a"), ("m", "er")]
    words = [
        "abc",      # (b,c) first -> [a, bc]; (a,b) must NOT touch it
        "abab",     # adjacent repeats both merge under (a,b)
        "aaa",      # greedy non-overlap: (a,a) -> [aa, a]; (aa,a) -> [aaa]
        "aaaa",     # [aa, aa] then (aa,a) finds no (aa, a) pair
        "merger",   # multi-char: m+er after (m,er)? er requires... chars only
        "bcbc",
        "ab",
        "a",
        "xyz",      # untouched
    ]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        r["tok"]: list(r["symbols"])
        for r in bpe_encode(docs, merges).collect()
    }
    for w in words:
        assert got[w] == _py_bpe(w, merges), (
            w, got[w], _py_bpe(w, merges)
        )


def _py_merge_pass(s: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _py_bpe_train(word_counts: dict[str, int], k: int):
    """Reference trainer: word-frequency formulation, argmax with
    (count DESC, pair ASC) tiebreak, greedy non-overlap merge pass."""
    syms = {w: list(w) for w in word_counts}
    merges = []
    for step in range(k):
        counts: dict[tuple[str, str], int] = {}
        for w, n in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + n
        if not counts:
            break
        best_n = max(counts.values())
        a, b = min(p for p, c in counts.items() if c == best_n)
        merges.append((step, a, b, best_n))
        syms = {w: _py_merge_pass(s, a, b) for w, s in syms.items()}
    return merges


def test_bpe_train_matches_reference_trainer(spark):
    """bpe_train must replay the canonical greedy trainer round for
    round — including frequency weighting (repeated words vote
    per occurrence) and the multi-char-symbol rounds."""
    from collections import Counter

    from mapreduce_inverted_index_spark.operators.textstats import bpe_train

    corpus = [
        "low lower lowest low low",
        "new newer newest new new new",
        "wider wide wide wider widest",
        "low newer wide low",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(docs, n_merges=6).orderBy("step").collect()
    ]
    wc = Counter(w for t in corpus for w in t.split())
    assert got == _py_bpe_train(dict(wc), 6)
    # sanity: the corpus is rich enough to reach multi-char merges
    assert any(len(a) > 1 or len(b) > 1 for _, a, b, _ in got)


def test_bpe_train_encode_roundtrip(spark):
    """The closed tokenizer loop: encode with the trained merge table
    and every encoded token must (a) re-concatenate to the original
    token and (b) equal the canonical per-word greedy BPE under the
    same merges."""
    from mapreduce_inverted_index_spark.operators.textstats import (
        bpe_encode,
        bpe_train,
    )
    from mapreduce_inverted_index_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, n_merges=8).orderBy("step").collect()
    ]
    assert len(merges) == 8
    sample = (
        bpe_encode(docs, merges)
        .select("tok", "symbols")
        .distinct()
        .limit(200)
        .collect()
    )
    assert len(sample) > 20  # the smoke fixture's vocab is small
    for r in sample:
        assert "".join(r["symbols"]) == r["tok"]
        assert list(r["symbols"]) == _py_bpe(r["tok"], merges)
