"""Golden + differential tests for the S2 HTML projection
(``strip_html`` / ``sql_strip_html``): pinned expected text for the
reference's semantics (content div -> drop table/script/style ->
space-joined text, ``reference/mapper/src/processor.py:146-155``),
bit-exact Spark-vs-DuckDB agreement on adversarial fixtures, and —
when BeautifulSoup happens to be importable — a direct comparison
with the reference's own extraction.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_inverted_index_spark.functions.text import (
    sql_strip_html,
    strip_html,
)

WIKI_PAGE = """<html><head><title>T</title><style>p {color: red}</style>
<script>var x = 1 < 2;</script></head><body>
<div id="mw-content-text"><p>Hello &amp; welcome, it&#39;s a <b>bold</b> test.</p>
<!-- a comment with <table> inside -->
<table class="infobox"><tr><td>DROP ME</td></tr></table>
<ul><li>keep&nbsp;list</li></ul></div>
<footer>drop footer</footer></body></html>"""

FIXTURES: list[tuple[str, str | None, str]] = [
    # (html, content_div_id, expected)
    (WIKI_PAGE, "mw-content-text", "Hello & welcome, it's a bold test. keep list"),
    (WIKI_PAGE, None,
     "T Hello & welcome, it's a bold test. keep list drop footer"),
    # reference parity: no content div -> empty document
    ("<html><body><p>no content div</p></body></html>", "mw-content-text", ""),
    # div attributes around the id, uppercase tags, self-closing tags
    ('<DIV class="x" id=mw-content-text lang="en">a<br/>b</DIV>',
     "mw-content-text", "a b"),
    # style/script bodies with angle brackets and case-mixed closers
    ("<p>x</p><SCRIPT>if (a<b) {}</SCRIPT ><style>q>p{}</style><p>y</p>",
     None, "x y"),
    # entities, including the decode-order trap &amp;lt;
    ("<p>a &lt;tag&gt; &quot;q&quot; &amp;lt; b</p>", None, 'a <tag> "q" &lt; b'),
    # empty + whitespace-only
    ("", None, ""),
    ("   \n\t  ", None, ""),
]


def _duck_strip(html: str, div: str | None) -> str:
    con = duckdb.connect()
    try:
        expr = sql_strip_html("h", content_div_id=div)
        return con.execute(f"SELECT {expr} FROM (SELECT ? AS h)", [html]).fetchone()[0]
    finally:
        con.close()


def test_strip_html_golden_and_differential(spark):
    rows = [(i, h) for i, (h, _, _) in enumerate(FIXTURES)]
    df = spark.createDataFrame(rows, "i int, h string")
    for i, (html, div, expected) in enumerate(FIXTURES):
        got_spark = (
            df.where(df.i == i)
            .select(strip_html("h", content_div_id=div).alias("c"))
            .collect()[0]["c"]
        )
        assert got_spark == expected, f"fixture {i} (spark)"
        assert _duck_strip(html, div) == expected, f"fixture {i} (duckdb)"


def test_strip_html_matches_beautifulsoup_when_available():
    """The reference uses BeautifulSoup; when it's importable, compare
    token-for-token on the Wikipedia-shaped fixture (modulo the
    documented separator-normalization difference)."""
    bs4 = pytest.importorskip("bs4")
    soup = bs4.BeautifulSoup(WIKI_PAGE, "html.parser")
    content = soup.find("div", {"id": "mw-content-text"})
    for el in content(["table", "script", "style"]):
        el.decompose()
    ref_tokens = content.get_text(separator=" ", strip=True).split()
    assert FIXTURES[0][2].split() == ref_tokens


def test_strip_html_null_flows_through(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,)], "i int").select(
        F.lit(None).cast("string").alias("h")
    )
    out = df.select(strip_html("h").alias("c")).collect()[0]["c"]
    assert out is None
