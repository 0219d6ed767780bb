"""Training-data curation operators beyond dedup: benchmark
decontamination, deterministic stratified sampling, and sequence
packing — the steps between "cleaned corpus" and "training batches"
in an LLM data pipeline.

All three are builtin-expression compositions (no UDFs) chosen so a
DuckDB oracle can replay them exactly:

  * decontamination = shingle semi-join against a (small, broadcast)
    benchmark set — the standard n-gram-overlap test-set filter;
  * stratified sampling hashes ids with md5 (NOT xxhash64: md5 is
    the hash both engines implement identically), so the sample is
    reproducible cross-engine and independent of partitioning;
  * sequence packing is contiguous per-source packing by token
    cumsum — a window cumsum, not a driver loop, so it scales with
    the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.operators.dedup import word_shingles

__all__ = [
    "contamination_hits",
    "decontaminate",
    "stratified_sample",
    "pack_sequences",
]


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_shingles: DataFrame | None = None,
    bench_shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-document count of word n-gram shingles shared with a
    benchmark/eval set — the overlap signal behind test-set
    decontamination. Output: ``doc_id, n_hits`` (docs with ≥1 hit).

    The benchmark side collapses to DISTINCT shingles before the
    join; it is tiny relative to the corpus (eval sets are KBs, the
    corpus is TBs), so Catalyst broadcasts it and the corpus never
    shuffles — each executor filters its own partitions.

    ``doc_shingles`` / ``bench_shingles``: optional prebuilt
    ``(doc_id, shingles)`` tables (e.g. the persisted table shared
    with the MinHash family).
    """
    if doc_shingles is None:
        doc_shingles = word_shingles(docs, n, text_col, id_col)
    if bench_shingles is None:
        bench_shingles = word_shingles(benchmark, n, text_col, id_col)
    doc_sh = doc_shingles.select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    bench_sh = (
        bench_shingles.select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus minus documents overlapping the benchmark by at
    least ``min_hits`` shingles (left-anti join on the flagged ids —
    document text never shuffles)."""
    flagged = contamination_hits(docs, benchmark, n, text_col, id_col).where(
        F.col("n_hits") >= min_hits
    )
    return docs.join(
        flagged.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )


def _md5_bucket(col, buckets: int = 100) -> F.Column:
    """Deterministic [0, buckets) bucket from md5 — identical math in
    Spark and DuckDB (xxhash64 exists only in Spark), independent of
    partitioning and stable across runs."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return F.pmod(h, F.lit(buckets))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its id's
    md5-bucket (0-99) falls under its stratum's percentage — the
    mixture-weighting step of a training-data pipeline ("3 parts web,
    1 part code, ..."). No shuffle at all: a pure filter the scan can
    evaluate; rates are compiled into the predicate.
    """
    bucket = _md5_bucket(F.col(id_col))
    rate = F.lit(default_rate * 100)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(r * 100)).otherwise(rate)
    return df.where(bucket < rate)


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Contiguous sequence packing: within each ``group_col``, docs
    (ordered by id) are packed into training sequences of
    ``budget_tokens`` by cumulative estimated token count — sequence
    k holds the docs whose preceding cumsum lies in
    [k·budget, (k+1)·budget).

    One window cumsum per group (single shuffle on the group key; the
    per-group sort is the packing ORDER, which any deterministic
    packer needs), then a plain aggregation. Output: ``source,
    seq_id, n_docs, seq_tokens``. Token estimate = ceil(chars/4), the
    standard BPE heuristic (see ``textstats.token_stats``).
    """
    est = F.ceil(F.length(text_col) / 4.0).cast("bigint")
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = docs.select(
        F.col(group_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        est.alias("est_tokens"),
    ).select(
        "source",
        "doc_id",
        "est_tokens",
        F.floor(
            (F.sum("est_tokens").over(w) - F.col("est_tokens"))
            / F.lit(budget_tokens)
        ).cast("bigint").alias("seq_id"),
    )
    return tagged.groupBy("source", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("est_tokens").alias("seq_tokens"),
    )
