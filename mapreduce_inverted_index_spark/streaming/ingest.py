"""Incremental corpus ingestion — the S1 "source walker" re-expressed
as a checkpointed file stream.

The reference's master walks paginated category listings and hands
each new batch of URLs to mappers (``master/src/master.py:48-86``):
state = "which pages have I already seen". The Spark-native analog is
a file-stream source over a growing directory with a checkpoint: each
``Trigger.AvailableNow`` run ingests exactly the files that arrived
since the last run, exactly once — the checkpoint IS the walker's
cursor, fault-tolerant and restartable for free.

At 100 TB this is the standing ingestion pattern: drop new corpus
shards into a landing directory (or Kafka topic — same downstream
code), run the ingest on a schedule or continuously, and every
downstream operator reads the growing canonical table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.operators import store
from mapreduce_inverted_index_spark.operators.store import mutation_lease

__all__ = [
    "stream_text_corpus",
    "ingest_available_now",
    "streamed_doc_ids",
    "maintain_index_available_now",
    "maintain_chunks_available_now",
    "maintain_semantic_cells_available_now",
    "maintain_takedowns_available_now",
    "maintain_cell_takedowns_available_now",
]


def stream_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Unbounded analog of ``sources.formats.read_text_corpus``: one
    row per newly-arrived text file, ``(source STRING, text STRING)``.
    (Stable doc_ids for streamed docs come from content/provenance —
    e.g. ``xxhash64(source)`` — not a global counter, which can't
    exist on an unbounded stream.)"""
    return (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(path)
        .select(
            F.input_file_name().alias("source"),
            F.col("value").alias("text"),
        )
    )


def ingest_available_now(
    stream: DataFrame, sink_path: str, checkpoint_path: str
) -> None:
    """Run one AvailableNow ingestion pass: append every not-yet-seen
    file to the Parquet sink and advance the checkpoint cursor.
    Re-running after new files arrive ingests ONLY the new files;
    re-running with nothing new is a no-op (exactly-once per file).
    """
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streamed_doc_ids(corpus: DataFrame) -> DataFrame:
    """``(source, text) → (doc_id, text)`` with provenance-stable ids:
    ``xxhash64(source)``. A global dense counter can't exist on an
    unbounded stream; a content/provenance hash gives every batch AND
    any batch replay the same id for the same file, which is what
    exactly-once maintenance needs.
    """
    return corpus.select(
        F.xxhash64("source").alias("doc_id"), F.col("text")
    )


def _swap_flat_dir(df: DataFrame, live_dir: str, tag: str) -> None:
    """Crash-safe whole-dir commit for FLAT (unpartitioned) stores:
    write to a uuid tmp, rename the live dir ASIDE, rename the tmp
    in, then drop the retired copy — nothing is unlinked until the
    new dir is live, so a kill at any point leaves a complete copy
    on disk (live, ``.retired-*``, or ``.tmp-*`` — the recovery
    order the takedown loop's fail-loud message names). The
    partition-level twin is ``operators.store.swap_partition_dirs``.

    Readers need no manifest here, unlike the partitioned stores
    (``store.refresh_manifest``): the whole store is ONE directory
    swapped by whole-dir renames, so a reader's listing resolves
    entirely against a single dir incarnation — it sees the complete
    old state, the complete new state, or fails loud (dir missing in
    the two-rename window; old files unlinked under a scan that
    listed pre-swap). A MIXED view would need per-partition renames,
    which flat stores don't have.
    """
    import uuid

    u = uuid.uuid4().hex[:8]
    tmp = live_dir.rstrip("/") + f".tmp-{tag}-{u}"
    retired = live_dir.rstrip("/") + f".retired-{tag}-{u}"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(live_dir):
        os.rename(live_dir, retired)
    os.rename(tmp, live_dir)
    shutil.rmtree(retired, ignore_errors=True)


def recover_flat_swaps(live_dir: str) -> "list[str]":
    """Executable crash recovery for :func:`_swap_flat_dir` orphans —
    the flat-store twin of ``store.recover_partition_swaps``. A swap
    that died mid-commit leaves one of three states, each with a
    complete copy on disk; this rolls the store back (or finishes
    cleanup) so a restarted maintenance loop just replays the
    uncommitted batch:

    - tmp present, live present: crash during the tmp WRITE — the
      live dir is untouched; drop the partial tmp.
    - tmp present, live missing: crash between rename-aside and
      rename-in — restore the retired copy, or when no retired copy
      exists (the swap was the FIRST-ever write) drop the tmp so the
      state is simply absent again. Rollback in both cases, never
      roll-forward: the replayed batch re-derives the new state, and
      rolling the tmp in would make a non-idempotent fold (e.g. the
      MG count merge) double-count its replay.
    - retired present, no tmp: crash after commit, before cleanup —
      the live dir is the new state; drop the retired copy.

    ``.tmp-swap-*`` siblings are the PARTITIONED store's orphans and
    belong to ``recover_partition_swaps`` — skipped here. Idempotent;
    returns the orphan dirs handled. The maintenance loops call this
    before every flat fold, so crash-restart self-heals."""
    base = os.path.basename(live_dir.rstrip("/"))
    parent = os.path.dirname(live_dir.rstrip("/")) or "."
    recovered: list = []
    if not os.path.isdir(parent):
        return recovered
    tmps: dict = {}
    retireds: dict = {}
    for d in os.listdir(parent):
        if d.startswith(f"{base}.tmp-swap-"):
            continue
        if d.startswith(f"{base}.tmp-"):
            tmps[d[len(base) + 5:]] = d
        elif d.startswith(f"{base}.retired-"):
            retireds[d[len(base) + 9:]] = d
    live_exists = os.path.isdir(live_dir)
    for key, d in sorted(tmps.items()):
        tmp = f"{parent}/{d}"
        if live_exists:
            shutil.rmtree(tmp)
        elif key in retireds:
            os.rename(f"{parent}/{retireds.pop(key)}", live_dir)
            shutil.rmtree(tmp)
            live_exists = True
        else:
            # first-ever write died pre-commit: rollback = no state
            shutil.rmtree(tmp)
        recovered.append(d)
    for key, d in sorted(retireds.items()):
        if live_exists:
            shutil.rmtree(f"{parent}/{d}")
        else:
            os.rename(f"{parent}/{d}", live_dir)
            live_exists = True
        recovered.append(d)
    return recovered


def _publish_batch_files(
    df: DataFrame, target_dir: str, batch_id: int, part_col: "str | None" = None
) -> None:
    """Idempotent APPEND for foreachBatch sinks on a bare filesystem:
    write the batch to a per-batch tmp dir, then ``os.replace`` each
    output file onto a DETERMINISTIC batch-named target
    (``<dir>/batch-<id>.parquet``, or per partition
    ``<dir>/<part_col>=v/batch-<id>.parquet``). A replayed batch
    recomputes the same rows (the fold reads only frozen state) and
    overwrites its own files instead of appending duplicates — the
    filesystem analog of a transactional sink keyed by batch_id. The
    tmp name is batch-deterministic too, so a crashed publish is
    simply overwritten by the replay and removed on its completion.
    """
    tmp = target_dir.rstrip("/") + f".tmp-batch-{batch_id}"
    if part_col is None:
        df.repartition(1).write.mode("overwrite").parquet(tmp)
        os.makedirs(target_dir, exist_ok=True)
        parts = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        if parts:
            os.replace(
                f"{tmp}/{parts[0]}", f"{target_dir}/batch-{batch_id}.parquet"
            )
    else:
        (
            df.repartition(part_col)
            .write.mode("overwrite")
            .partitionBy(part_col)
            .parquet(tmp)
        )
        for d in os.listdir(tmp):
            if not d.startswith(f"{part_col}="):
                continue
            parts = [
                f for f in os.listdir(f"{tmp}/{d}") if f.endswith(".parquet")
            ]
            if not parts:
                continue
            os.makedirs(f"{target_dir}/{d}", exist_ok=True)
            os.replace(
                f"{tmp}/{d}/{parts[0]}",
                f"{target_dir}/{d}/batch-{batch_id}.parquet",
            )
    shutil.rmtree(tmp)
    # Commit the append to manifest-resolved probe readers: refresh —
    # or CREATE, for a store born from this loop's first batch — the
    # reader manifest, inside the fold's mutation lease. Two reader
    # races close here: (a) a manifest left by a prior delete/compact
    # goes silently STALE on append (every file it names still exists,
    # nothing fails loud — ADVICE r11 #1); (b) a stream-born store
    # with no manifest is read by directory listing, and a multi-
    # partition append is many renames — a concurrent listing can see
    # SOME partitions' new batch file but not others, a state no
    # commit ever produced (the r13 append storm's target). Creating
    # the manifest on first publish gives every partitioned store
    # one-swap visibility from birth: readers see the whole batch or
    # none of it. Partition-less sinks (dups) are consumed by the
    # fold itself inside the lease, where listing is race-free; they
    # stay manifest-less.
    if part_col is not None:
        store.refresh_manifest(
            target_dir, part_col, schema_json=df.schema.json()
        )


def maintain_chunks_available_now(
    spark: SparkSession,
    sf_dir: str,
    sink_dir: str,
    checkpoint_path: str,
    width: int = 64,
    stride: int = 48,
    glob: str = "documents.parquet",
) -> None:
    """Incremental RAG-chunk maintenance: one AvailableNow pass chunks
    exactly the document files that arrived since the last pass and
    APPENDS their chunks to the sink — exactly-once per file via the
    checkpoint cursor.

    Unlike the index (``maintain_index_available_now``) and the MG
    sketch (``sketches.maintain_frequent_terms_available_now``),
    chunking needs NO merge step: ``chunk_documents`` is a stateless
    per-document map with stable ``(doc_id, chunk_no)`` identity, so
    a plain streaming parquet APPEND is already correct and
    idempotent at the file level — per-pass cost is O(new docs),
    zero state, zero rewrite. This is the cheap tier of incremental
    maintenance; the invariant (pytest-pinned) is that after any
    number of passes the sink equals batch ``chunk_documents`` over
    everything ingested so far. Downstream, the embedder processes
    only the appended files (their paths are the delta).
    """
    from mapreduce_inverted_index_spark.operators.passages import (
        chunk_documents,
    )
    from mapreduce_inverted_index_spark.streaming.sketches import docs_stream

    chunks = chunk_documents(
        docs_stream(spark, sf_dir, glob), width=width, stride=stride
    )
    q = (
        chunks.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def maintain_index_available_now(
    spark: SparkSession, corpus_path: str, index_dir: str, checkpoint_path: str
) -> None:
    """Stream-maintained inverted index: one AvailableNow pass indexes
    exactly the files that arrived since the last pass and folds them
    into the persisted index via :func:`operators.inverted_index.
    merge_index` (delta build + term-keyed full-outer merge).

    This replaces the reference's re-run-the-whole-job model
    (``master/src/master.py:123-176`` rebuilds the index from scratch
    per /scrape): cost per pass is O(new docs) + O(index merge), not
    O(corpus). Invariant (pytest-pinned): after every pass the stored
    index equals a batch ``build_index`` over all files so far.

    Store layouts (same detection as the takedown loop): a BUCKETED
    store (``write_index_store`` layout) folds each delta
    bucket-locally via ``merge_into_index_store`` — only the bucket
    dirs the delta's vocabulary hashes into rewrite, so ADD and
    DELETE now share the partition-local discipline. A flat dir
    keeps the whole-index ``merge_index`` with the rename-aside
    commit (write-to-tmp because the merged plan READS ``index_dir``
    while its sink would truncate it — DSv1 overwrite truncates
    before compute). On a real cluster the same foreachBatch body
    targets a transactional table format (Iceberg/Delta MERGE); the
    dir swaps are the filesystem-only stand-in for that commit.
    """
    from mapreduce_inverted_index_spark.operators.inverted_index import (
        build_index,
        is_index_store,
        merge_index,
        merge_into_index_store,
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sess = batch_df.sparkSession
        # single-writer guard: a concurrent writer's entry recovery
        # would roll back THIS fold's in-flight swap (store.
        # mutation_lease docstring); the leaf mutator re-enters
        with mutation_lease(index_dir):
            recover_flat_swaps(index_dir)  # heal crashed prior commit
            delta = build_index(streamed_doc_ids(batch_df))
            # layout authority is the sidecar, not bucket= dirs: a
            # store whose every doc was taken down has zero bucket
            # dirs but must stay bucketed (merge_into_index_store
            # rebuilds in place)
            if os.path.isdir(index_dir) and is_index_store(index_dir):
                merge_into_index_store(sess, index_dir, delta)
                return
            if os.path.isdir(index_dir):
                merged = merge_index(sess.read.parquet(index_dir), delta)
            else:
                merged = delta
            _swap_flat_dir(merged, index_dir, f"add-{batch_id}")

    q = (
        stream_text_corpus(spark, corpus_path)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def maintain_semantic_cells_available_now(
    spark: SparkSession,
    emb_dir: str,
    state_dir: str,
    checkpoint_path: str,
    glob: str = "*.parquet",
    n_cells: int = 16,
    tau: float = 0.4,
    r: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_cell: "int | None" = 8,
) -> None:
    """Stream-maintained semantic-dedup state — the embedding-space
    twin of the MinHash/chunk/index maintenance loops: each
    ``Trigger.AvailableNow`` pass processes exactly the embedding
    files that arrived since the last pass (checkpoint cursor =
    exactly-once per file) and, per micro-batch,

    1. dedups the batch against the STORED cells via
       ``similarity.semantic_incremental_dedup`` (batch × probed
       cells, never batch × corpus) and APPENDS the matches to
       ``state_dir/dups`` — the takedown/skip list a training
       pipeline consumes;
    2. assigns the batch to cells against the STORED codebook and
       APPENDS it to ``state_dir/cells`` ``partitionBy(cell)`` — so
       the state the NEXT batch probes stays partition-pruned.

    The codebook (``state_dir/cents``) is trained once, on the first
    batch, then frozen on disk — every later batch assigns against
    the same floats, which is what makes state == batch
    ``ivf_assign`` over everything ingested (the multi-pass pytest
    invariant). Batches are deduped against PRIOR state only
    (within-batch duplicates are the batch operator
    ``semantic_dedup``'s job, same contract as
    ``dedup.minhash_incremental_dedup``).

    Self-healing layout: the ADD loop appends one file per micro-
    batch per cell, so N passes would leave probe scans opening
    O(passes x cells) files. When a maintenance pass completes, any
    cell that crossed ``max_files_per_cell`` is compacted in place
    (``similarity.compact_ivf_cells`` — row content untouched,
    pytest-pinned across multiple passes), so the store's file count
    stays bounded without a manual compaction schedule. Pass ``None``
    to disable (e.g. when an external table service owns compaction).

    Durability: both sinks publish through
    :func:`_publish_batch_files` — deterministic ``batch-<id>``-named
    files, so a micro-batch replayed after a crash (sink writes
    landed, checkpoint commit did not) OVERWRITES its own files
    instead of appending duplicates; the dup recompute additionally
    excludes the crashed attempt's own cells file from "prior state"
    so the replay derives identical matches (pytest-pinned by a
    deleted-commit-marker replay test). A production deployment still
    prefers a transactional table format (Iceberg/Delta) keyed by
    ``(batch_id, vec_id)`` — this is its bare-filesystem analog.
    Per-pass cost: O(batch × r/n_cells of state) for the dedup +
    O(batch) for the publish — state is never rewritten.
    """
    from mapreduce_inverted_index_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        semantic_incremental_dedup,
    )

    cents_dir = f"{state_dir}/cents"
    cells_dir = f"{state_dir}/cells"
    dups_dir = f"{state_dir}/dups"
    schema = spark.read.option("pathGlobFilter", glob).parquet(emb_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(emb_dir)
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sess = batch_df.sparkSession
        # lease on the CELL store — the state shared with the takedown
        # twin (maintain_cell_takedowns_available_now / compact):
        # overlapping with either would let its entry recovery roll
        # back this fold's appends mid-batch. cents/dups are written
        # only by this loop and ride inside the same lease.
        with mutation_lease(cells_dir):
            _semantic_fold_body(sess, batch_df, batch_id)

    def _semantic_fold_body(sess, batch_df, batch_id) -> None:
        if os.path.isdir(cents_dir):
            cents = sess.read.parquet(cents_dir)
        else:
            ivf_centroids(batch_df, n_cells, 3, id_col, vec_col).write.mode(
                "overwrite"
            ).parquet(cents_dir)
            # re-read so every later batch assigns against the same
            # on-disk floats, not a recomputed lineage
            cents = sess.read.parquet(cents_dir)
        if os.path.isdir(cells_dir):
            # dedup against PRIOR state, materialized BEFORE the
            # batch itself is appended below. Published as a
            # deterministic batch-named file so a crash-replay
            # overwrites instead of duplicating (the dedup reads only
            # PRIOR-batch files — its own batch file, if a crashed
            # attempt published one, is excluded so the replay
            # recomputes the same matches)
            prior = sess.read.parquet(cells_dir).where(
                ~F.input_file_name().contains(f"batch-{batch_id}.parquet")
            )
            _publish_batch_files(
                semantic_incremental_dedup(
                    batch_df,
                    prior,
                    cents,
                    tau=tau,
                    r=r,
                    id_col=id_col,
                    vec_col=vec_col,
                ),
                dups_dir,
                batch_id,
            )
        _publish_batch_files(
            ivf_assign(batch_df, cents, id_col, vec_col),
            cells_dir,
            batch_id,
            part_col="cell",
        )

    q = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if max_files_per_cell is not None and os.path.isdir(cells_dir):
        from mapreduce_inverted_index_spark.operators.similarity import (
            compact_ivf_cells,
        )

        compact_ivf_cells(spark, cells_dir, max_files_per_cell)


def _takedown_loop(
    spark: SparkSession,
    takedown_dir: str,
    glob: str,
    checkpoint_path: str,
    state_dir: str,
    state_kind: str,
    fold,
) -> None:
    """Shared AvailableNow scaffolding for the erasure queues: file
    stream over the id directory, empty-batch skip, FAIL-LOUD when
    the target state does not exist yet (the micro-batch stays
    uncommitted and replays once the state appears — a silent return
    would checkpoint erasure ids away forever), then the
    state-specific ``fold(batch_df)``."""
    schema = (
        spark.read.option("pathGlobFilter", glob).parquet(takedown_dir).schema
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(takedown_dir)
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        # single-writer guard: concurrent with the matching ADD loop
        # (or a second takedown), the other writer's entry recovery
        # would roll back this fold's in-flight swap — fail loud
        # instead (store.mutation_lease docstring); leaf mutators
        # re-enter the lease
        with mutation_lease(state_dir):
            # a prior pass that crashed mid-commit left the state
            # intact in a sibling dir; heal it before the existence
            # check (a state-dir missing because of such a crash must
            # NOT fail loud forever — only a never-built state should)
            recover_flat_swaps(state_dir)
            if not os.path.isdir(state_dir):
                raise FileNotFoundError(
                    f"takedown fold: no {state_kind} at {state_dir}; "
                    "build it first, then re-run (the uncommitted "
                    "batch replays). If a prior run crashed "
                    "mid-commit, the fully written state sits intact "
                    f"next to this path in a '{state_dir}.retired-*' "
                    f"or '{state_dir}.tmp-*' dir — recover_flat_swaps "
                    "/ recover_partition_swaps heals it on the next "
                    "maintenance pass"
                )
            fold(batch_df, batch_id)

    q = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def maintain_takedowns_available_now(
    spark: SparkSession,
    takedown_dir: str,
    index_dir: str,
    checkpoint_path: str,
    glob: str = "*.parquet",
) -> None:
    """The DELETE side of stream maintenance — a takedown queue
    (GDPR erasure, opt-outs, retention expiry) as a checkpointed file
    stream: each AvailableNow pass folds exactly the takedown-id
    files that arrived since the last pass into the stored inverted
    index.

    Two store layouts, detected by the ``_mii_store.json`` sidecar
    (NOT by ``bucket=`` dirs — an emptied bucketed store has none):

    - **bucketed store** (``write_index_store`` layout,
      ``bucket=K/`` partition dirs — the production path): the batch
      folds via ``delete_from_index_store``, which rewrites ONLY the
      bucket partitions whose postings contain the batch's ids and
      commits with the shared crash-safe dir swap. Per-batch IO is
      O(affected buckets), not O(index) — a 64-doc takedown must not
      rewrite a multi-TB index. This is the discipline the embedding
      twin (``maintain_cell_takedowns_available_now`` →
      ``delete_from_ivf_cells``) has always had.
    - **flat parquet dir** (legacy / small indexes): whole-index
      rewrite via ``delete_from_index`` (DataFrame batch — the
      broadcast-anti-join branch, plan size constant in queue
      length), committed by the rename-aside swap (a crash at any
      point leaves a complete copy on disk).

    Together with the ADD loops (index/chunks/MG/semantic cells) this
    closes the maintenance pair: a corpus pipeline runs both on a
    schedule and the stored state tracks ingest MINUS erasure without
    ever re-reading document text. Invariant (pytest-pinned for both
    layouts): after any pass history, the stored index equals
    ``build_index`` of the ingested corpus minus every taken-down
    doc_id. Ids with no postings (already deleted, never ingested)
    fold through as no-ops — takedown queues are idempotent by
    nature.
    """
    from mapreduce_inverted_index_spark.operators.inverted_index import (
        delete_from_index,
        delete_from_index_store,
        is_index_store,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        # sidecar-based detection (see maintain_index_available_now):
        # an emptied bucketed store must no-op here, not crash the
        # flat path on schema inference
        if is_index_store(index_dir):
            delete_from_index_store(
                sess, index_dir, batch_df.select("doc_id")
            )
            return
        merged = delete_from_index(
            sess.read.parquet(index_dir), batch_df.select("doc_id")
        )
        _swap_flat_dir(merged, index_dir, f"del-{batch_id}")

    _takedown_loop(
        spark, takedown_dir, glob, checkpoint_path, index_dir,
        "index", fold,
    )


def maintain_cell_takedowns_available_now(
    spark: SparkSession,
    takedown_dir: str,
    cells_dir: str,
    checkpoint_path: str,
    glob: str = "*.parquet",
) -> None:
    """The embedding-state twin of
    :func:`maintain_takedowns_available_now`: a checkpointed erasure
    queue of ``vec_id`` files folds into the IVF cell store via
    ``similarity.delete_from_ivf_cells`` — per batch, only the cell
    partitions containing the batch's ids rewrite (tmp-write +
    per-cell dir swap); everything else keeps its exact files. With
    this, both stored states (text index, embedding cells) have the
    full streaming lifecycle: ADD (ingest loops), DELETE (takedown
    queues), and for cells COMPACT (:func:`similarity.
    compact_ivf_cells`). A missing cell store fails the micro-batch
    (uncommitted → replays once the store exists), never silently
    commits erasure ids away.
    """
    from mapreduce_inverted_index_spark.operators.similarity import (
        delete_from_ivf_cells,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        delete_from_ivf_cells(
            batch_df.sparkSession, cells_dir, batch_df.select("vec_id")
        )

    _takedown_loop(
        spark, takedown_dir, glob, checkpoint_path, cells_dir,
        "cell store", fold,
    )
