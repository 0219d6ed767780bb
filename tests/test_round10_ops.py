"""Round-10 hardening: the fully-emptied bucketed index store.

A takedown batch that erases every remaining doc drops every
``bucket=`` directory (``swap_partition_dirs`` retires a partition
whose last term dies), leaving only the ``_mii_store.json`` sidecar.
That store must stay a STORE: reads see an empty index, further
deletes no-op, and re-ingest rebuilds the bucketed layout in place —
never a silent fallback to the flat-parquet path (which would crash
on schema inference or rebuild a non-bucketed layout).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _index_rows(df):
    return sorted(
        (r["term"], tuple(r["postings"]), r["df"])
        for r in df.collect()
    )


def _bucket_dirs(path):
    return sorted(d for d in os.listdir(path) if d.startswith("bucket="))


def test_emptied_store_reads_as_empty_index(spark, tmp_path):
    """Deleting EVERY doc leaves a sidecar-only store that reads as an
    empty index; probes return empty; a further delete is a no-op."""
    from mapreduce_inverted_index_spark.operators.inverted_index import (
        build_index,
        delete_from_index_store,
        is_index_store,
        read_index_store,
        term_lookup_store,
        write_index_store,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "gamma alpha")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "store")
    write_index_store(build_index(docs), path)
    assert _bucket_dirs(path)

    delete_from_index_store(spark, path, [1, 2, 3])
    assert _bucket_dirs(path) == []
    assert is_index_store(path)  # the sidecar is the layout authority
    assert read_index_store(spark, path).count() == 0
    assert term_lookup_store(spark, path, ["alpha", "beta"]).count() == 0
    # a delete against the emptied store is a clean no-op, not a crash
    assert delete_from_index_store(spark, path, [7]) == []


def test_emptied_store_reingest_rebuilds_bucketed_layout(spark, tmp_path):
    """merge_into_index_store against the emptied store rebuilds the
    bucketed layout in place (empty base), with the sidecar's pinned
    arity — and the result equals a fresh build."""
    from mapreduce_inverted_index_spark.operators.inverted_index import (
        build_index,
        delete_from_index_store,
        merge_into_index_store,
        read_index_store,
        write_index_store,
    )

    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(10, "delta alpha"), (11, "epsilon")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "store")
    write_index_store(build_index(old), path)
    delete_from_index_store(spark, path, [1, 2])
    assert _bucket_dirs(path) == []

    affected = merge_into_index_store(spark, path, build_index(new))
    assert affected  # delta buckets were written
    assert _bucket_dirs(path)  # layout is bucketed again
    assert _index_rows(read_index_store(spark, path)) == _index_rows(
        build_index(new)
    )


def test_streaming_loops_route_emptied_store_through_store_paths(
    spark, tmp_path
):
    """End-to-end through the maintenance loops: takedown of every doc,
    then a takedown pass against the emptied store (must no-op, not
    crash on the flat path), then re-ingest (must rebuild BUCKETED,
    not flat). Invariant: stored index == build_index(ingested minus
    taken-down) at every step."""
    from mapreduce_inverted_index_spark.operators.inverted_index import (
        build_index,
        read_index_store,
        write_index_store,
    )
    from mapreduce_inverted_index_spark.streaming.ingest import (
        maintain_index_available_now,
        maintain_takedowns_available_now,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id bigint, text string"
    )
    index_dir = str(tmp_path / "index")
    queue = str(tmp_path / "queue")
    ckpt_del = str(tmp_path / "ckpt_del")
    ckpt_add = str(tmp_path / "ckpt_add")
    corpus = str(tmp_path / "corpus")
    write_index_store(build_index(docs), index_dir)

    # pass 1: take down everything
    spark.createDataFrame([(1,), (2,)], "doc_id bigint").coalesce(
        1
    ).write.mode("append").parquet(queue)
    maintain_takedowns_available_now(spark, queue, index_dir, ckpt_del)
    assert _bucket_dirs(index_dir) == []

    # pass 2: another takedown against the emptied store — a no-op,
    # NOT a flat-path schema-inference crash
    spark.createDataFrame([(99,)], "doc_id bigint").coalesce(
        1
    ).write.mode("append").parquet(queue)
    maintain_takedowns_available_now(spark, queue, index_dir, ckpt_del)
    assert _bucket_dirs(index_dir) == []

    # pass 3: re-ingest — must rebuild the BUCKETED layout, not flat
    # (the ingest loop streams text files with provenance-hash ids)
    from mapreduce_inverted_index_spark.streaming.ingest import (
        streamed_doc_ids,
    )

    os.makedirs(corpus)
    with open(f"{corpus}/x.txt", "w") as f:
        f.write("delta epsilon")
    with open(f"{corpus}/y.txt", "w") as f:
        f.write("alpha")
    maintain_index_available_now(spark, corpus, index_dir, ckpt_add)
    assert _bucket_dirs(index_dir)
    batch_corpus = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(corpus)
        .select(
            F.input_file_name().alias("source"),
            F.col("value").alias("text"),
        )
    )
    assert _index_rows(read_index_store(spark, index_dir)) == _index_rows(
        build_index(streamed_doc_ids(batch_corpus))
    )
