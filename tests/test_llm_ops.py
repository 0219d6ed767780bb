"""Property tests for the non-SQL-expressible LLM ops (LSH family):
the driver only rows-checks these, so recall/determinism is verified
here against brute force on sf0.001.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.operators import dedup as D
from mapreduce_inverted_index_spark.operators import similarity as S
from mapreduce_inverted_index_spark.sources.tables import load_table

THRESH = 0.35


def _docs(spark, sf_smoke):
    return load_table(spark, sf_smoke, "documents")


def _brute_pairs(spark, docs, n=3, threshold=THRESH):
    """All-pairs exact shingle-Jaccard (ground truth for LSH recall)."""
    sh = D.word_shingles(docs, n=n)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def test_minhash_recall_vs_brute_force(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    brute = {(r["doc_a"], r["doc_b"]) for r in _brute_pairs(spark, docs).collect()}
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_near_dup(docs, threshold=THRESH).collect()
    }
    assert brute, "fixture should contain planted near-dup pairs"
    # Exact-Jaccard verification makes false positives impossible...
    assert lsh <= brute
    # ...and 16x4 banding at this threshold should catch nearly all.
    recall = len(lsh) / len(brute)
    assert recall >= 0.9, f"LSH recall {recall:.2f} ({len(lsh)}/{len(brute)})"


def test_minhash_deterministic(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    a = sorted(map(tuple, D.minhash_near_dup(docs).collect()))
    b = sorted(map(tuple, D.minhash_near_dup(docs).collect()))
    assert a == b


def test_lsh_topk_is_subset_of_brute_force_scores(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = S.brute_force_topk(emb, queries, k=10**9)  # all scored pairs
    brute_scores = {
        (r["query_id"], r["vec_id"]): r["cos_sim"] for r in brute.collect()
    }
    lsh = S.lsh_bucket_topk(emb, queries, k=10).collect()
    assert lsh, "probe buckets should not be empty at sf0.001"
    for r in lsh:
        assert r["rank"] <= 10
        # every LSH result carries the same cosine the exact scan computes
        assert brute_scores[(r["query_id"], r["vec_id"])] == r["cos_sim"]


def test_lsh_signature_sql_form_equals_column_form(spark, sf_smoke):
    # lsh_signature is generated as one JVM-parsed SQL string (plan-
    # construction cost); _hyperplane_sign is the Column-level
    # reference. Pin the two bit-identical over the whole fixture.
    emb = load_table(spark, sf_smoke, "embeddings")
    ref = sum(
        (
            S._hyperplane_sign("embedding", p, 64)
            * F.lit(1 << (S.N_PLANES - 1 - p))
            for p in range(S.N_PLANES)
        ),
        F.lit(0),
    )
    n_diff = (
        emb.select(
            S.lsh_signature("embedding").alias("a"), ref.alias("b")
        )
        .where("a <> b")
        .count()
    )
    assert n_diff == 0


def test_lsh_topk_deterministic(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(map(tuple, S.lsh_bucket_topk(emb, queries).collect()))
    b = sorted(map(tuple, S.lsh_bucket_topk(emb, queries).collect()))
    assert a == b


def test_exact_dedup_groups_planted_duplicates(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat  sat"),
            Row(doc_id=1, text="THE CAT SAT"),  # same after normalize
            Row(doc_id=2, text="something else"),
        ]
    )
    rows = {r["content_hash"]: r for r in D.exact_dedup(docs).collect()}
    assert len(rows) == 2
    dup = next(r for r in rows.values() if r["n_copies"] == 2)
    assert dup["doc_id"] == 0  # keeper is min id


def test_simhash_close_for_near_dup_far_for_random(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    brute = _brute_pairs(spark, docs).orderBy(F.desc("jaccard")).limit(1).collect()
    doc_a, doc_b = brute[0]["doc_a"], brute[0]["doc_b"]
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(docs).collect()}
    near = bin(sigs[doc_a] ^ sigs[doc_b]).count("1")
    far_ids = sorted(set(sigs) - {doc_a, doc_b})[:2]
    far = bin(sigs[far_ids[0]] ^ sigs[far_ids[1]]).count("1")
    assert near < far, f"near-dup hamming {near} should beat random {far}"


def test_dup_components_path_graph(spark):
    """Min-label propagation must traverse the full diameter: a
    4-node path needs 3 rounds for label 1 to reach node 4."""
    from mapreduce_inverted_index_spark.operators.dedup import dup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "doc_a LONG, doc_b LONG"
    )
    got = {
        r["doc_id"]: r["component"] for r in dup_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_ivf_full_probe_equals_brute_force(spark, sf_smoke):
    """Probing every cell must reduce IVF to exact brute force —
    same rows, same ranks (the codebook only partitions work)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in S.brute_force_topk(emb, q, k=5).collect()
    }
    full = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in S.ivf_topk(emb, q, k=5, n_cells=8, n_probe=8).collect()
    }
    assert full == exact


def test_ivf_probe_subset_and_recall(spark, sf_smoke):
    """n_probe < n_cells: results are a subset of the scored space
    with decent recall@5 against brute force on the clustered
    fixture embeddings."""
    emb = load_table(spark, sf_smoke, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in S.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in S.ivf_topk(emb, q, k=5, n_cells=8, n_probe=3).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"IVF recall@5 {recall:.2f} below floor"


def test_simhash_hamming_banding_exact_vs_brute_force(spark, sf_smoke):
    """Pigeonhole banding is EXACT within k: on an unblocked corpus
    the banded candidate join must return precisely the brute-force
    all-pairs result for Hamming <= k — no misses (pigeonhole
    guarantee) and no extras (verify step). Also bounds the bucket
    fan-out: 15-bit band keys spread a uniform corpus so no single
    (band, key) bucket grows past a small constant."""
    docs = _docs(spark, sf_smoke)
    sigs = D.simhash_signatures(docs)

    k = 3
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in D.simhash_hamming_candidates(docs, max_hamming=k, sigs=sigs).collect()
    }
    s = sigs.collect()
    brute = {
        (a["doc_id"], b["doc_id"], bin(a["simhash"] ^ b["simhash"]).count("1"))
        for a in s
        for b in s
        if a["doc_id"] < b["doc_id"]
        and bin(a["simhash"] ^ b["simhash"]).count("1") <= k
    }
    assert banded == brute

    # Bucket bound: the 4x15-bit banding must not concentrate an
    # unblocked uniform corpus into mega-buckets (linear-ish join).
    n_docs = sigs.count()
    max_bucket = max(
        r["c"]
        for i in range(4)
        for r in sigs.select(
            F.expr(f"shiftright(simhash, {i * 15}) & {(1 << 15) - 1}").alias("key")
        )
        .groupBy("key")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    assert max_bucket <= max(8, n_docs // 20)


def test_minhash_incremental_equals_full_cross_pairs(spark, tmp_path):
    """Incremental dedup (new batch vs stored state) must find exactly
    the cross-split subset of what full minhash_near_dup finds on the
    union — banding, storage round-trip, and verify all hash-exact."""
    from mapreduce_inverted_index_spark.operators.dedup import (
        minhash_incremental_dedup,
        minhash_near_dup,
        write_minhash_state,
    )
    from mapreduce_inverted_index_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    base = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)

    state = str(tmp_path / "state")
    write_minhash_state(base, state)
    got = sorted(
        (r["new_id"], r["dup_of"], r["jaccard"])
        for r in minhash_incremental_dedup(
            new,
            spark.read.parquet(f"{state}/bands"),
            spark.read.parquet(f"{state}/shingles"),
        ).collect()
    )

    full = minhash_near_dup(docs).collect()
    want = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        if r["doc_a"] % 5 == 0
        else (r["doc_b"], r["doc_a"], r["jaccard"])
        for r in full
        if (r["doc_a"] % 5 == 0) != (r["doc_b"] % 5 == 0)
    )
    assert got == want and len(got) > 0


def test_semantic_incremental_precision_and_cross_pairs(spark, tmp_path):
    """Incremental semantic dedup vs stored IVF cells: every returned
    pair must be a REAL cosine>=tau cross-split pair (precision 1.0),
    and the found set must equal the cell-blocked expectation computed
    without the storage round-trip (state write changes nothing)."""
    from pyspark.sql import functions as F

    from mapreduce_inverted_index_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.where(F.col("vec_id") % 5 != 0)
    new = emb.where(F.col("vec_id") % 5 == 0)
    cents = S.ivf_centroids(base)
    assigned = S.ivf_assign(base, cents)

    path = str(tmp_path / "cells")
    S.write_ivf_cells(assigned, path)
    via_state = sorted(
        map(
            tuple,
            S.semantic_incremental_dedup(
                new, spark.read.parquet(path), cents, tau=0.4, r=6
            ).collect(),
        )
    )
    in_memory = sorted(
        map(
            tuple,
            S.semantic_incremental_dedup(
                new, assigned.select("vec_id", "vec", "cell"), cents,
                tau=0.4, r=6,
            ).collect(),
        )
    )
    assert via_state == in_memory and len(via_state) > 0

    from mapreduce_inverted_index_spark.functions.vectors import (
        cosine_similarity,
    )

    brute = {
        (r["new_id"], r["dup_of"])
        for r in new.select(F.col("vec_id").alias("new_id"), F.col("embedding").alias("va"))
        .crossJoin(
            base.select(F.col("vec_id").alias("dup_of"), F.col("embedding").alias("vb"))
        )
        .where(F.round(cosine_similarity("va", "vb"), 6) >= 0.4)
        .select("new_id", "dup_of")
        .collect()
    }
    assert all((a, b) in brute for a, b, _ in via_state), "precision 1.0"
