"""The inverted-index pipeline — the reference's entire data plane as
one lazy DataFrame expression (SURVEY.md §7.2).

Reference lifecycle collapsed here (SURVEY.md §3.1 steps 3-11):
  * map phase   ``mapper/src/processor.py:173-199`` → ``doc_terms``
  * map-side combine ``mapper/src/processor.py:80-134`` → automatic
    partial aggregation inside ``groupBy('term')``
  * reduce merge/sort/dedup ``reducer/src/processor.py:15-88`` →
    ``sort_array(collect_set(...))``

Scale notes (100 TB posture):
  * ``doc_terms`` is a narrow map stage — no shuffle until the
    ``groupBy('term')``, whose map-side partial ``collect_set`` plays
    the reference's "shuffle_intermediate_results" combiner role but
    per-partition and spillable.
  * term is a naturally high-cardinality, Zipf-skewed key; AQE skew
    handling plus the per-doc distinct (which caps any (term,doc)
    pair at 1) keep reducer partitions bounded by distinct-doc counts.
  * the final index is a DataFrame, not a single JSON dict — persist
    with ``write_index`` (Parquet, optionally bucketed by term) so
    term lookups become partition/bucket-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.functions.stopwords import (
    stopwords_spark_in_list,
)
from mapreduce_inverted_index_spark.functions.text import terms, tokenize

# The stopword predicate as ONE SQL string parsed JVM-side (r14: the
# Column form `~col("term").isin(*STOPWORDS)` marshalled 179 py4j
# round-trips per doc_terms/doc_term_freq call — the same
# plan-construction tax r13 removed from terms(); identical expression
# tree, Catalyst still folds it to the codegen'd InSet).
_NOT_STOP_SQL = "term NOT IN (" + stopwords_spark_in_list() + ")"

__all__ = [
    "doc_terms",
    "doc_term_freq",
    "build_index",
    "index_stats",
    "doc_freq",
    "write_index",
    "write_index_tables",
    "write_doc_tables",
    "merge_index",
    "gap_encode_col",
    "gap_decode_col",
    "gap_encode_index",
    "gap_decode_postings",
    "delete_from_index",
    "index_bucket_col",
    "write_index_store",
    "read_index_store",
    "delete_from_index_store",
    "merge_into_index_store",
    "term_lookup_store",
]


def doc_terms(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Map phase: one row per (doc_id, term), terms distinct per doc.

    Equivalent of the reference's ``map_terms_to_documents``
    (``mapper/src/processor.py:173-199``): P1-P5 then emit (P6). The
    per-doc ``array_distinct`` happens *before* explode so the row
    expansion (and later shuffle) carries no duplicate pairs; the
    stopword filter runs *after* explode as a relational predicate —
    Catalyst converts the 179-string IN to a codegen'd hash-set
    InSet, which benched 4.6x faster than filtering inside the array
    (array_except with a literal array is per-row interpreted work).
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize(text_col))).alias("term"),
    ).where(F.expr(_NOT_STOP_SQL))


def doc_term_freq(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf) with in-document duplicates counted — the
    term-frequency variant of :func:`doc_terms` (same explode-then-
    InSet shape).
    """
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokenize(text_col)).alias("term"),
        )
        .where(F.expr(_NOT_STOP_SQL))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def build_index(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The flagship query: documents → inverted index.

    Output: ``term STRING, postings ARRAY<BIGINT> (sorted, distinct),
    df BIGINT``. ``collect_set`` + ``sort_array`` reproduce the
    reducer's merge → sort-by-doc_id → dedup-first-wins
    (``reducer/src/processor.py:36-77``; first-wins == set semantics
    here because the payload is just doc_id — SURVEY.md §7.4).
    """
    pairs = doc_terms(docs, text_col, id_col)
    return pairs.groupBy("term").agg(
        F.sort_array(F.collect_set("doc_id")).alias("postings"),
        F.count("*").alias("df"),
    )


def doc_freq(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document frequency per term (no postings payload).

    The array-free aggregate — at 100 TB you compute stats like this
    without materializing postings at all; Catalyst plans a partial
    count per partition, so shuffle volume is O(distinct terms).
    """
    return (
        doc_terms(docs, text_col, id_col)
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def index_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-level counters — the reference's metadata block
    (``mapper/src/processor.py:62,121``, ``reducer/src/processor.py:103``)
    as one aggregate row: total postings, distinct terms, documents.
    """
    pairs = doc_terms(docs, text_col, id_col)
    return pairs.agg(
        F.count("*").alias("num_postings"),
        F.countDistinct("term").alias("num_terms"),
        F.countDistinct("doc_id").alias("num_docs"),
    )


def write_index(index: DataFrame, path: str, *, buckets: int = 0, json_parity: bool = False) -> None:
    """Persist the index (K2, ``reducer/src/processor.py:90-113``).

    Canonical sink is Parquet; ``buckets > 0`` bucket-sorts by term so
    future term lookups and index-index joins are shuffle-free.
    ``json_parity`` additionally writes a single JSON file like the
    reference's ``inverted_index_{ts}.json`` — test-only (a 100 TB
    index cannot be one JSON file).
    """
    if buckets:
        (index.write.mode("overwrite")
              .bucketBy(buckets, "term").sortBy("term")
              .option("path", path)
              .saveAsTable(f"inverted_index_b{buckets}"))
    else:
        index.write.mode("overwrite").parquet(path)
    if json_parity:
        index.coalesce(1).write.mode("overwrite").json(path + ".json")


def write_index_tables(
    docs: DataFrame,
    path: str,
    *,
    buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix: str = "mii",
) -> tuple[str, str]:
    """Materialize the BUCKETED index tier: the postings index and the
    (doc_id, term, tf) table, both ``bucketBy(buckets, term)`` +
    ``sortBy(term)`` — the 100 TB lookup story the reference's
    single-JSON index (``reducer/src/processor.py:90-113``) cannot
    tell. Equal bucket counts on the term key mean every term-keyed
    operation downstream — lookup joins, tf rollups, bm25's qtf/df,
    phrase-index joins, index-index merges — reads pre-partitioned,
    pre-sorted buckets: zero Exchange, and equality predicates on
    ``term`` prune to a single bucket file per table.

    Returns the two table names ``(index_table, tf_table)``.
    """
    index_name = f"{prefix}_index_b{buckets}"
    tf_name = f"{prefix}_tf_b{buckets}"
    (build_index(docs, text_col, id_col)
        .write.mode("overwrite")
        .bucketBy(buckets, "term").sortBy("term")
        .option("path", f"{path}/index")
        .saveAsTable(index_name))
    (doc_term_freq(docs, text_col, id_col)
        .write.mode("overwrite")
        .bucketBy(buckets, "term").sortBy("term")
        .option("path", f"{path}/tf")
        .saveAsTable(tf_name))
    return index_name, tf_name


def write_doc_tables(
    docs: DataFrame,
    path: str,
    *,
    buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix: str = "mii",
) -> tuple[str, str]:
    """Materialize the DOC-keyed co-located bucket tier — the
    doc_id-axis mirror of :func:`write_index_tables` (term axis) and
    the SMB fact pair (``queries_relational_tpch.py``'s orderkey
    axis): the per-(doc, term) frequency table and the per-doc
    length table, both ``bucketBy(buckets, doc_id)`` +
    ``sortBy(doc_id)``. Every doc-keyed pipeline downstream — BM25's
    tf x dl normalization, per-doc quality joins, funnel/retention
    user joins re-keyed on the doc axis — reads pre-partitioned,
    pre-sorted buckets and joins with ZERO pre-join Exchange
    (pytest-asserted). Both tables pay their doc_id shuffle ONCE at
    write time; at 100 TB that is the difference between re-shuffling
    the (doc, term) fact on every scoring run and never shuffling it
    again.

    Returns the two table names ``(tf_table, dlen_table)``.
    """
    tf_name = f"{prefix}_dtf_b{buckets}"
    dlen_name = f"{prefix}_dlen_b{buckets}"
    tf = doc_term_freq(docs, text_col, id_col)
    (tf.write.mode("overwrite")
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .option("path", f"{path}/dtf")
        .saveAsTable(tf_name))
    # derive dlen from the just-WRITTEN tf table, not the logical tf
    # plan: the corpus is tokenized once, and the rollup runs
    # shuffle-free on the bucketed layout (doc_id groupBy satisfies
    # the bucket distribution)
    spark = docs.sparkSession
    dlen = spark.table(tf_name).groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("dl")
    )
    (dlen.write.mode("overwrite")
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .option("path", f"{path}/dlen")
        .saveAsTable(dlen_name))
    return tf_name, dlen_name


def gap_encode_col(postings: F.Column) -> F.Column:
    """Gap-encoding expression: sorted ``[p0, p1, p2, ...]`` →
    ``[p0, p1-p0, p2-p1, ...]`` (``zip_with`` against the 1-shifted
    list — lambda touches only its bound arrays, so no CollapseProject
    re-inlining; see the word_shingles note, ``dedup.py:104``)."""
    prev = F.concat(
        F.array(F.lit(0).cast("bigint")),
        F.slice(postings, 1, F.greatest(F.size(postings) - 1, F.lit(0))),
    )
    return F.zip_with(postings, prev, lambda a, b: a - b)


def gap_decode_col(gaps: F.Column) -> F.Column:
    """Inverse expression: prefix-sum gaps back to absolute ids.
    ``aggregate`` folds left carrying (running total, rebuilt list) —
    linear per row, the sequential decode a real reader does per
    block."""
    return F.aggregate(
        gaps,
        F.struct(
            F.lit(0).cast("bigint").alias("acc"),
            F.array().cast("array<bigint>").alias("out"),
        ),
        lambda st, g: F.struct(
            (st.acc + g).alias("acc"),
            F.concat(st.out, F.array(st.acc + g)).alias("out"),
        ),
        lambda st: st.out,
    )


def gap_encode_index(index: DataFrame) -> DataFrame:
    """Delta/gap-encode the postings payload.

    This is the storage transform every real posting-list format
    (Lucene, PForDelta, varint blocks) starts from: sorted ids have
    huge absolute values but tiny deltas, so downstream varint/
    bit-packing compresses gaps 5-10x better than raw ids — at
    100 TB the index's dominant cost is postings bytes, and this is
    the knob. Pure per-row array math: a narrow map stage, no
    shuffle, fused into whatever wrote the index.

    Output: ``term, gaps ARRAY<BIGINT>, df`` (df preserved).
    """
    return index.select(
        "term", gap_encode_col(F.col("postings")).alias("gaps"), "df"
    )


def gap_decode_postings(encoded: DataFrame) -> DataFrame:
    """Inverse of :func:`gap_encode_index`.

    Output: ``term, postings ARRAY<BIGINT>, df``.
    """
    return encoded.select(
        "term", gap_decode_col(F.col("gaps")).alias("postings"), "df"
    )


def merge_index(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental index maintenance: merge a delta index (newly
    ingested docs) into a base index without touching base documents.

    The reference rebuilds its index from scratch per run; at 100 TB
    the index is maintained incrementally — index only the new docs,
    then full-outer-merge on term: postings = sorted distinct union,
    df recomputed from the merged postings. One shuffle on term (and
    none at all if both sides were written ``bucketBy(term)`` — see
    :func:`write_index`). Invariant (test + oracle-checked):
    ``merge_index(build_index(old), build_index(new)) ==
    build_index(old ∪ new)`` when old/new partition the corpus.
    """
    empty = F.array().cast("array<bigint>")
    b = base.select("term", F.col("postings").alias("_pb"))
    d = delta.select("term", F.col("postings").alias("_pd"))
    merged = b.join(d, "term", "full_outer").select(
        "term",
        F.sort_array(
            F.array_distinct(
                F.concat(F.coalesce("_pb", empty), F.coalesce("_pd", empty))
            )
        ).alias("postings"),
    )
    return merged.select(
        "term", "postings", F.size("postings").cast("bigint").alias("df")
    )


INDEX_STORE_BUCKETS = 16


def index_bucket_col(term: "F.Column | str", n_buckets: int = INDEX_STORE_BUCKETS) -> F.Column:
    """Deterministic term-hash bucket id — the partition key of the
    maintained index STORE (:func:`write_index_store`). A pure
    expression of the term, so any writer/reader pair agrees on a
    term's bucket without coordination."""
    t = F.col(term) if isinstance(term, str) else term
    return F.pmod(F.xxhash64(t), F.lit(n_buckets)).cast("int")


def write_index_store(
    index: DataFrame, path: str, n_buckets: int = INDEX_STORE_BUCKETS
) -> None:
    """Materialize the index as a term-hash-bucket-PARTITIONED store
    (``path/bucket=K/``) — the layout that makes maintenance
    partition-local: a takedown batch touches only the buckets whose
    postings actually contain its ids
    (:func:`delete_from_index_store` rewrites those dirs and nothing
    else), the exact discipline the IVF cell store already has
    (``similarity.delete_from_ivf_cells``). Directory partitioning —
    not ``bucketBy`` table buckets — because the maintenance commit
    is a per-directory swap (``store.swap_partition_dirs``); the
    bucketed-TABLE tier for shuffle-free lookup joins is
    :func:`write_index_tables`, a different axis.
    """
    from mapreduce_inverted_index_spark.operators.store import (
        mutation_lease,
        purge_swap_orphans,
        refresh_manifest,
    )

    # seeding is a mutation too: overwriting a store a live
    # maintenance fold is mid-swap on loses the fold's batch
    with mutation_lease(path):
        # a tmp-swap orphan from a writer that died mid-swap would
        # survive the overwrite, and the NEXT mutator's entry
        # recovery would roll its pre-crash retired copies in over
        # the fresh seed — purge (not recover: the overwrite makes
        # the pre-crash state irrelevant) before writing
        purge_swap_orphans(path)
        (
            index.withColumn("bucket", index_bucket_col("term", n_buckets))
            # one file per bucket, term-sorted within it: probe scans
            # open O(probed buckets) files and row-group-skip on the
            # term min/max stats (the write_index_tables sortBy story,
            # directory-partitioned)
            .repartition(n_buckets, "bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(path)
        )
        # sidecar records the bucket-fn arity: ADD merges and
        # term-probe pruning must hash NEW terms with the same
        # n_buckets the store was laid out with (DELETE doesn't need
        # it — the bucket column rides through its regroup). Written
        # after the data so a failed write never leaves a meta file
        # pointing at nothing.
        import json

        with open(f"{path}/_mii_store.json", "w") as f:
            json.dump({"n_buckets": n_buckets}, f)
        # reader-visible commit of the seeded snapshot (the overwrite
        # dropped any prior manifest along with the old layout)
        refresh_manifest(path, "bucket")


def _store_n_buckets(path: str) -> int:
    import json
    import os

    sidecar = f"{path}/_mii_store.json"
    if not os.path.isfile(sidecar):
        # bucket= dirs without the arity sidecar = a write_index_store
        # that crashed between its data write and its sidecar write.
        # ADDs can't hash new terms without the arity — fail loud with
        # the recovery step instead of guessing (DELETEs don't come
        # here; the bucket column rides through their regroup).
        raise FileNotFoundError(
            f"{sidecar} missing but the store layout is bucketed — a "
            "prior write_index_store died before committing its "
            "sidecar; re-run write_index_store (mode is a full "
            "overwrite) to re-seed the store"
        )
    with open(sidecar) as f:
        return int(json.load(f)["n_buckets"])


def is_index_store(path: str) -> bool:
    """True iff ``path`` is a :func:`write_index_store` layout. The
    authority is the ``_mii_store.json`` sidecar, NOT the presence of
    ``bucket=`` dirs: a takedown that erases every remaining doc drops
    every bucket directory (``swap_partition_dirs`` retires a
    partition whose last term dies), and that empty-but-bucketed store
    must keep routing through the store maintenance paths — detection
    off ``bucket=`` dirs would silently fall back to the flat-parquet
    path and crash on schema inference (or rebuild a flat layout).
    ``bucket=`` dirs WITHOUT a sidecar (a seed write that died between
    data and sidecar) still count as a store, so the half-seeded state
    fails loud in ``_store_n_buckets`` instead of silently rebuilding
    a flat layout over a bucketed directory."""
    import os

    return os.path.isfile(f"{path}/_mii_store.json") or (
        os.path.isdir(path) and bool(_store_bucket_dirs(path))
    )


def _store_bucket_dirs(path: str) -> "list[str]":
    import os

    return [d for d in os.listdir(path) if d.startswith("bucket=")]


_INDEX_SCHEMA = "term string, postings array<bigint>, df bigint"


def read_index_store(spark, path: str) -> DataFrame:
    """Read a :func:`write_index_store` store back as a plain index
    ``(term, postings, df)`` — the bucket partition column is storage
    layout, not index content. A store whose every doc has been taken
    down (sidecar present, zero bucket dirs) is an EMPTY index, not an
    error.

    Resolves through the reader manifest
    (``store.resolve_manifest_files``) when present: one committed
    snapshot's explicit file list, so a scan concurrent with a
    maintenance swap never sees a mixed directory listing (it
    converges to the post-swap snapshot or fails loud). Manifest-less
    (pre-manifest) stores fall back to directory reading."""
    from mapreduce_inverted_index_spark.operators.store import (
        open_snapshot,
    )

    kind, df = open_snapshot(spark, path, "bucket")
    if kind == "empty":  # committed-empty snapshot
        return spark.createDataFrame([], _INDEX_SCHEMA)
    if kind == "df":
        return df.select("term", "postings", "df")
    if not _store_bucket_dirs(path):
        return spark.createDataFrame([], _INDEX_SCHEMA)
    return spark.read.parquet(path).select("term", "postings", "df")


def delete_from_index_store(
    spark, path: str, doc_ids: "list[int] | DataFrame"
) -> list[int]:
    """Takedown from the bucketed index store — the text twin of
    ``similarity.delete_from_ivf_cells``: remove a batch of doc_ids,
    rewriting ONLY the bucket partitions whose postings contain them.
    Untouched bucket directories keep their exact files
    (pytest-pinned by file listing) — at 100 TB a takedown batch
    touching 64 docs rewrites ~64 term-buckets' worth of postings,
    never a multi-TB index.

    Mechanics: one scan locates the affected buckets (explode
    postings, broadcast semi-join on the id batch, distinct bucket —
    shuffle rows are bucket ids, not postings); the affected buckets'
    rows then re-aggregate per (bucket, term) with the dead ids
    anti-joined out — the bucket column rides THROUGH the regroup, so
    no bucket recomputation (and no bucket-count parameter) is
    needed; terms whose last posting dies drop out, a bucket whose
    last term dies loses its directory. Commit = the shared
    crash-safe dir swap (``store.swap_partition_dirs``). Returns the
    affected bucket ids.
    """
    from mapreduce_inverted_index_spark.operators.store import (
        mutation_lease,
        recover_partition_swaps,
        swap_partition_dirs,
    )

    with mutation_lease(path):
        recover_partition_swaps(path, "bucket")
        if not _store_bucket_dirs(path):
            # every doc already taken down — the store is a valid
            # EMPTY index (sidecar still pins the bucket arity for
            # future ADDs) and any delete is a no-op
            return []
        if isinstance(doc_ids, DataFrame):
            dead = doc_ids.select(
                F.col("doc_id").cast("bigint").alias("doc_id")
            )
        else:
            dead = spark.createDataFrame(
                [(int(d),) for d in doc_ids], "doc_id bigint"
            )
        store = spark.read.parquet(path)
        affected = sorted(
            r["bucket"]
            for r in store.select(
                "bucket", F.explode("postings").alias("doc_id")
            )
            .join(F.broadcast(dead), "doc_id")
            .select("bucket")
            .distinct()
            .collect()
        )
        if not affected:
            return []
        pairs = (
            store.where(F.col("bucket").isin(affected))
            .select("bucket", "term", F.explode("postings").alias("doc_id"))
            .join(F.broadcast(dead), "doc_id", "left_anti")
        )
        remaining = (
            pairs.groupBy("bucket", "term")
            .agg(
                F.sort_array(F.collect_list("doc_id")).alias("postings"),
                F.count("*").cast("bigint").alias("df"),
            )
            .select("term", "postings", "df", "bucket")
            # pack each rewritten bucket into ONE file (the
            # compact_ivf_cells discipline): without this, every
            # rewrite scatters a bucket across up to
            # shuffle-partition-count files, and probe scans pay the
            # open() count forever
            .repartition(len(affected), "bucket")
            .sortWithinPartitions("term")
        )
        swap_partition_dirs(path, remaining, "bucket", affected)
        return affected


def merge_into_index_store(spark, path: str, delta: DataFrame) -> list[int]:
    """ADD to the bucketed index store — the other half of
    :func:`delete_from_index_store`'s bucket-local discipline: fold a
    delta index (newly ingested docs, built by :func:`build_index`
    over the batch only) into the store, rewriting ONLY the bucket
    partitions the delta's terms hash into. For a small ingest batch
    the delta vocabulary covers a subset of buckets; the rest keep
    their exact files (pytest-pinned) — per-batch IO tracks the
    batch's vocabulary footprint, not the index.

    Mechanics: the delta's buckets come from one bounded collect
    (≤ n_buckets ints — the sidecar written by
    :func:`write_index_store` pins n_buckets so new terms hash with
    the store's arity); the affected subset full-outer-merges with
    the delta via :func:`merge_index` and swaps in through the shared
    crash-safe commit. Returns the affected bucket ids.
    """
    from mapreduce_inverted_index_spark.operators.store import (
        mutation_lease,
        recover_partition_swaps,
        swap_partition_dirs,
    )

    with mutation_lease(path):
        recover_partition_swaps(path, "bucket")
        n_buckets = _store_n_buckets(path)
        tagged = delta.withColumn(
            "bucket", index_bucket_col("term", n_buckets)
        )
        affected = sorted(
            r["bucket"]
            for r in tagged.select("bucket").distinct().collect()
        )
        if not affected:
            return []
        if _store_bucket_dirs(path):
            base = (
                spark.read.parquet(path)
                .where(F.col("bucket").isin(affected))
                .select("term", "postings", "df")
            )
        else:
            # fully-taken-down store: merge the delta against an
            # empty base so re-ingest rebuilds the BUCKETED layout
            # in place
            base = spark.createDataFrame([], _INDEX_SCHEMA)
        merged = (
            merge_index(base, delta)
            .withColumn("bucket", index_bucket_col("term", n_buckets))
            # one file per rewritten bucket (see
            # delete_from_index_store)
            .repartition(len(affected), "bucket")
            .sortWithinPartitions("term")
        )
        swap_partition_dirs(path, merged, "bucket", affected)
        return affected


def term_lookup_store(spark, path: str, terms: "list[str]") -> DataFrame:
    """Exact term probe over the PARTITIONED index store: the probe
    terms' buckets become a partition-literal predicate, so the scan
    opens only those bucket directories (``PartitionFilters`` on the
    plan, pytest-audited) — the directory-layout twin of the
    bucketed-TABLE lookup (``term_queries.term_lookup_bucketed``).
    The bucket list is query metadata (≤ |terms| ints, computed with
    the store's own hash arity from the sidecar), like an IVF probe's
    cell list.

    Output: ``term, postings ARRAY<BIGINT>, df``.

    Like :func:`read_index_store`, resolves one committed snapshot
    through the reader manifest when present (mid-swap probes never
    see a mixed listing); the bucket predicate still reaches the
    explicit-file-list scan as ``PartitionFilters`` (pytest-audited),
    so pruning is unchanged.
    """
    from mapreduce_inverted_index_spark.operators.store import (
        open_snapshot,
    )

    kind, snap = open_snapshot(spark, path, "bucket")
    if kind == "empty" or (
        kind == "manifestless" and not _store_bucket_dirs(path)
    ):
        return spark.createDataFrame([], _INDEX_SCHEMA)
    n_buckets = _store_n_buckets(path)
    probe = spark.createDataFrame(
        [(t,) for t in terms], "term string"
    ).select(index_bucket_col("term", n_buckets).alias("bucket"))
    buckets = sorted(r["bucket"] for r in probe.distinct().collect())
    src = snap if kind == "df" else spark.read.parquet(path)
    return (
        src.where(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        .select("term", "postings", "df")
    )


DELETE_INLINE_THRESHOLD = 10_000


def delete_from_index(
    index: DataFrame,
    doc_ids: "list[int] | DataFrame",
    inline_threshold: int = DELETE_INLINE_THRESHOLD,
) -> DataFrame:
    """Incremental index maintenance, the DELETE half (adds are
    :func:`merge_index`): remove a batch of documents from a built
    index without re-reading any document text. Postings are filtered
    per term, df recomputed, terms whose last posting vanishes drop
    out — so the result is EXACTLY ``build_index`` of the surviving
    corpus (the invariant the oracle and pytest assert).

    Two physical strategies, picked by batch size:

    - ``len(doc_ids) <= inline_threshold`` (the common case — a
      deletion batch from takedowns/opt-outs/retention expiry is
      operator-input-sized, not corpus-sized): inline the ids as one
      array literal and ``array_except`` per row. A pure per-row MAP
      over the index — no join, no shuffle, and on a
      ``bucketBy(term)`` index the rewrite is embarrassingly parallel
      per bucket file.
    - larger batches, or ``doc_ids`` passed as a DataFrame (column
      ``doc_id``): inlining would grow the PLAN itself linearly with
      the batch (serialization, analysis, and broadcast-to-every-task
      costs — the scale-killer), so instead EXPLODE postings and
      broadcast-anti-join against the deletion set, then regroup per
      term with an explicit sort. One shuffle on term; the deletion
      side stays broadcast-sized (a multi-GB deletion list means you
      want :func:`build_index` on the filtered corpus instead).
    """
    if not isinstance(doc_ids, DataFrame) and len(doc_ids) <= inline_threshold:
        dead = F.array(*[F.lit(int(d)).cast("bigint") for d in doc_ids])
        return (
            index.select(
                "term", F.array_except("postings", dead).alias("postings")
            )
            .where(F.size("postings") > 0)
            .select(
                "term",
                "postings",
                F.size("postings").cast("bigint").alias("df"),
            )
        )
    if isinstance(doc_ids, DataFrame):
        dead_df = doc_ids.select(F.col("doc_id").cast("bigint").alias("doc_id"))
    else:
        spark = index.sparkSession
        dead_df = spark.createDataFrame(
            [(int(d),) for d in doc_ids], "doc_id bigint"
        )
    pairs = index.select(
        "term", F.explode("postings").alias("doc_id")
    ).join(F.broadcast(dead_df), "doc_id", "left_anti")
    return pairs.groupBy("term").agg(
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
        F.count("*").cast("bigint").alias("df"),
    )
