"""Forced-route parity for IVF assignment (the lm_bigram gated-route
discipline): the literal-argmax projection (`_argmax_cell`, the
checkpoint=True / ivf_assign production shape) and the legacy
broadcast-crossJoin + max_by aggregate must be FLOAT-IDENTICAL —
each (vector, centroid) cosine is the same expression tree over the
same values, so the k-means fixpoint and every cell tag match
exactly, not approximately.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
    )


def test_codebook_routes_are_float_identical(spark):
    """ivf_centroids(checkpoint=True) — per-round collect + literal
    argmax — equals ivf_centroids(checkpoint=False) — broadcast
    crossJoin + corpus max_by — to the last bit, across iterations
    (any divergence compounds through the Lloyd rounds, so iters=3
    is a strong pin)."""
    from mapreduce_inverted_index_spark.operators.similarity import (
        ivf_centroids,
    )

    emb = _emb(spark)
    lit_route = {
        r["cell"]: r["centroid"]
        for r in ivf_centroids(emb, n_cells=8, iters=3, checkpoint=True)
        .collect()
    }
    legacy = {
        r["cell"]: r["centroid"]
        for r in ivf_centroids(emb, n_cells=8, iters=3, checkpoint=False)
        .collect()
    }
    assert lit_route.keys() == legacy.keys()
    for cell, c in lit_route.items():
        assert c == legacy[cell], f"cell {cell} centroid diverged"


def test_assignment_matches_broadcast_maxby_route(spark):
    """ivf_assign (literal-argmax projection) reproduces the legacy
    crossJoin(broadcast) + max_by aggregate cell-for-cell."""
    from mapreduce_inverted_index_spark.functions.vectors import (
        cosine_similarity,
    )
    from mapreduce_inverted_index_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    emb = _emb(spark)
    cents = ivf_centroids(emb, n_cells=8, iters=2)
    got = {
        r["vec_id"]: r["cell"] for r in ivf_assign(emb, cents).collect()
    }
    want = {
        r["vec_id"]: r["cell"]
        for r in emb.crossJoin(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cell",
                F.struct(
                    cosine_similarity("embedding", "centroid"),
                    -F.col("cell"),
                ),
            ).alias("cell")
        )
        .collect()
    }
    assert got == want


def test_multi_assignment_matches_broadcast_route(spark):
    """ivf_multi_assign (literal projection + explode) reproduces the
    legacy crossJoin + collect_list/sort/slice aggregate exactly —
    same (vec_id, cell) multiset, same tie preference."""
    from mapreduce_inverted_index_spark.functions.vectors import (
        cosine_similarity,
    )
    from mapreduce_inverted_index_spark.operators.similarity import (
        ivf_centroids,
        ivf_multi_assign,
    )

    emb = _emb(spark)
    cents = ivf_centroids(emb, n_cells=8, iters=2)
    got = sorted(
        (r["vec_id"], r["cell"])
        for r in ivf_multi_assign(emb, cents, r=3).collect()
    )
    legacy = (
        emb.select(F.col("vec_id"), F.col("embedding").alias("vec"))
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "vec", "cell",
            cosine_similarity("vec", "centroid").alias("cos_c"),
        )
        .groupBy("vec_id", "vec")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("cos_c").alias("c"),
                            (-F.col("cell")).alias("nc"),
                        )
                    ),
                    asc=False,
                ),
                1,
                3,
            ).alias("_top")
        )
        .select("vec_id", F.explode("_top").alias("_t"))
        .select("vec_id", (-F.col("_t.nc")).alias("cell"))
    )
    want = sorted((r["vec_id"], r["cell"]) for r in legacy.collect())
    assert got == want


def test_assignment_plan_is_exchange_free(spark):
    """The production assignment is a scan-side projection: zero
    Exchange, zero Join in the physical plan (at 100 TB the corpus
    must not move to be cell-tagged)."""
    from mapreduce_inverted_index_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    emb = _emb(spark)
    cents = ivf_centroids(emb, n_cells=8, iters=1)
    plan = (
        ivf_assign(emb, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
