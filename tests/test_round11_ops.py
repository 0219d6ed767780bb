"""Round-11 operator edge semantics (ADVICE r10 item 4).

The literal-codebook IVF routes (``ivf_assign`` / ``ivf_multi_assign``
/ ``ivf_centroids(checkpoint=True)``) collect the codebook at
plan-build time; an empty codebook used to produce ``F.lit([])`` /
null cells where the legacy broadcast-join routes produced an empty
result. This file pins the documented short-circuits: empty codebook
-> empty result with the normal schema, empty corpus -> empty
codebook, and the literal helper fails loud if reached with no rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _vecs(spark, n=6, dim=3):
    return spark.createDataFrame(
        [(i, [float(i + d) for d in range(dim)]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )


def _empty_codebook(spark):
    return spark.createDataFrame([], "cell int, centroid array<double>")


def test_ivf_assign_empty_codebook_short_circuits(spark):
    from mapreduce_inverted_index_spark.operators.similarity import ivf_assign

    out = ivf_assign(_vecs(spark), _empty_codebook(spark))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "vec", "cell"]
    assert out.schema["cell"].dataType.simpleString() == "int"


def test_ivf_multi_assign_empty_codebook_short_circuits(spark):
    from mapreduce_inverted_index_spark.operators.similarity import (
        ivf_multi_assign,
    )

    out = ivf_multi_assign(_vecs(spark), _empty_codebook(spark), r=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "vec", "cell"]


def test_ivf_centroids_empty_corpus_returns_empty_codebook(spark):
    from mapreduce_inverted_index_spark.operators.similarity import (
        ivf_centroids,
    )

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    for checkpoint in (True, False):
        cents = ivf_centroids(empty, n_cells=4, iters=2, checkpoint=checkpoint)
        assert cents.count() == 0
        assert [f.name for f in cents.schema.fields] == ["cell", "centroid"]


def test_cell_score_structs_rejects_empty_rows():
    from mapreduce_inverted_index_spark.operators.similarity import (
        _cell_score_structs,
    )

    with pytest.raises(ValueError, match="empty codebook"):
        _cell_score_structs("vec", [])


def test_ivf_assign_keeps_duplicate_rows_per_row(spark):
    """Documented per-row semantics: duplicate (id, vec) input rows
    each get their own output row (the retired corpus re-aggregate
    collapsed them)."""
    from mapreduce_inverted_index_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    base = _vecs(spark, n=4)
    doubled = base.unionAll(base)
    cents = ivf_centroids(base, n_cells=2, iters=1)
    out = ivf_assign(doubled, cents)
    assert out.count() == 8
    assert out.groupBy("vec_id").count().where(F.col("count") != 2).count() == 0
