"""Round-9 operator tests: bucket-level index takedown, the shared
partition-dir swap, flat-store rename-aside crash-safety, the
bigram-LM join route gate, streaming auto-compaction, and the
doc-keyed co-located bucket tier."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _index_rows(df):
    return sorted(
        (r["term"], tuple(r["postings"]), r["df"])
        for r in df.select("term", "postings", "df").collect()
    )


def _bucket_files(path: str) -> dict:
    """{bucket dir -> sorted [(file, size, mtime_ns)]} — the exact-
    files fingerprint untouched buckets must keep."""
    out = {}
    for d in sorted(os.listdir(path)):
        if not d.startswith("bucket="):
            continue
        full = f"{path}/{d}"
        out[d] = sorted(
            (f, os.path.getsize(f"{full}/{f}"), os.stat(f"{full}/{f}").st_mtime_ns)
            for f in os.listdir(full)
            if f.endswith(".parquet")
        )
    return out


def test_delete_from_index_store_touches_only_affected_buckets(spark, tmp_path):
    """The bucketed takedown must (a) leave the store equal to
    build_index of the surviving corpus and (b) keep every untouched
    bucket directory's exact files (same names, sizes, mtimes).
    Synthetic few-term docs so the dead docs' terms land in a strict
    subset of buckets — real documents' hundreds of distinct terms
    would touch every one of 16 buckets and make (b) vacuous (at
    corpus scale the bucket count is thousands, so a takedown batch
    always touches a subset; per-bucket rewrite cost is the point)."""
    from mapreduce_inverted_index_spark.operators.inverted_index import (
        build_index,
        delete_from_index_store,
        read_index_store,
        write_index_store,
    )

    # letter suffixes: the tokenizer's [^a-z\s] regex strips digits
    docs = spark.createDataFrame(
        [
            (
                i,
                f"alpha{chr(97 + i)} beta{chr(97 + i)} "
                f"gamma{chr(97 + i % 3)}",
            )
            for i in range(20)
        ],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "store")
    write_index_store(build_index(docs), path)
    before = _bucket_files(path)
    assert len(before) > 4  # the test is vacuous on a 1-bucket store

    dead = [0, 1]
    affected = delete_from_index_store(spark, path, dead)
    assert affected  # those docs' terms live somewhere

    after = _bucket_files(path)
    untouched = [d for d in before if int(d.split("=")[1]) not in affected]
    assert untouched, "a 2-doc/6-term takedown should not touch every bucket"
    for d in untouched:
        assert after.get(d) == before[d], f"{d} was rewritten"

    want = _index_rows(build_index(docs.where(~F.col("doc_id").isin(dead))))
    assert _index_rows(read_index_store(spark, path)) == want


def test_delete_from_index_store_noop_and_idempotent(spark, tmp_path):
    """Ghost ids (never ingested) must be a pure no-op — zero affected
    buckets, zero file churn; replaying a delete is idempotent."""
    from mapreduce_inverted_index_spark.operators.inverted_index import (
        build_index,
        delete_from_index_store,
        read_index_store,
        write_index_store,
    )
    from mapreduce_inverted_index_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "store")
    write_index_store(build_index(docs), path)

    dead = [r["doc_id"] for r in docs.limit(2).collect()]
    delete_from_index_store(spark, path, dead)
    snap = _bucket_files(path)
    rows = _index_rows(read_index_store(spark, path))

    assert delete_from_index_store(spark, path, [10**12, 10**12 + 1]) == []
    assert _bucket_files(path) == snap  # ghost pass: zero churn

    delete_from_index_store(spark, path, dead)  # replay
    assert _index_rows(read_index_store(spark, path)) == rows


def test_takedown_stream_bucketed_store(spark, tmp_path):
    """maintain_takedowns_available_now must detect the bucketed
    layout and fold through delete_from_index_store: invariant holds
    across overlapping passes, and buckets untouched by a pass keep
    their exact files."""
    from mapreduce_inverted_index_spark.operators.inverted_index import (
        build_index,
        write_index_store,
    )
    from mapreduce_inverted_index_spark.sources.tables import load_table
    from mapreduce_inverted_index_spark.streaming.ingest import (
        maintain_takedowns_available_now,
    )

    docs = load_table(spark, SF, "documents")
    index_dir = str(tmp_path / "index")
    queue = str(tmp_path / "queue")
    ckpt = str(tmp_path / "ckpt")
    write_index_store(build_index(docs), index_dir)

    batches = [
        [r["doc_id"] for r in docs.where(F.col("doc_id") % 10 == 0).collect()],
        [r["doc_id"] for r in docs.where(F.col("doc_id") % 10 < 2).collect()]
        + [10**12],
    ]
    gone: set = set()
    for ids in batches:
        spark.createDataFrame(
            [(int(i),) for i in ids], "doc_id bigint"
        ).coalesce(1).write.mode("append").parquet(queue)
        maintain_takedowns_available_now(spark, queue, index_dir, ckpt)
        gone |= set(ids)
        want = _index_rows(
            build_index(docs.where(~F.col("doc_id").isin(list(gone))))
        )
        got = _index_rows(
            spark.read.parquet(index_dir).select("term", "postings", "df")
        )
        assert got == want

    # a no-new-files pass leaves the store byte-identical
    snap = _bucket_files(index_dir)
    maintain_takedowns_available_now(spark, queue, index_dir, ckpt)
    assert _bucket_files(index_dir) == snap


def test_flat_swap_leaves_complete_copy(spark, tmp_path):
    """_swap_flat_dir must never unlink the live dir before the new
    one is in place: after the swap the live dir holds the new rows,
    and no step window exists where neither copy is complete (proxy:
    the retired dir is created by rename, so a crash between the two
    renames leaves the full old copy under .retired-*)."""
    from mapreduce_inverted_index_spark.streaming.ingest import _swap_flat_dir

    live = str(tmp_path / "state")
    spark.range(5).write.parquet(live)
    _swap_flat_dir(spark.range(10, 13), live, "t")
    assert sorted(r["id"] for r in spark.read.parquet(live).collect()) == [
        10,
        11,
        12,
    ]
    # no tmp/retired dirs left behind
    assert not [
        d
        for d in os.listdir(tmp_path)
        if d.startswith("state.tmp-") or d.startswith("state.retired-")
    ]


def test_colocated_doc_tier_has_zero_exchange(spark):
    """The doc-keyed bucket pair (tf x dl) must SortMergeJoin with
    ZERO Exchange anywhere in the plan — both tables pre-partitioned
    and pre-sorted on doc_id at write time (the SMB fact-pair
    property on the doc axis)."""
    from mapreduce_inverted_index_spark.plans.registry import all_queries

    df = all_queries()["colocated_doc_tf_norm"].fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 0, plan[:2000]
