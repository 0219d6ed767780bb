"""Property tests (hypothesis) for the round-8 operators: BPE
training vs the canonical greedy trainer, bloom-join exactness under
arbitrary key overlap and bitmap sizing, and the log-histogram
quantile error bound under arbitrary positive-integer distributions.
"""

from __future__ import annotations

import os
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.test_tokenizer_parity import _py_bpe_train

_SETTINGS = dict(
    # MII_HYP_EXAMPLES widens the search for soak runs (CI default 8)
    max_examples=int(os.environ.get("MII_HYP_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def test_bpe_train_property(spark):
    """For arbitrary small corpora over a tiny alphabet (adversarial
    for ties and repeats: aaa, abab, ...), bpe_train must replay the
    canonical greedy trainer round for round."""
    from mapreduce_inverted_index_spark.operators.textstats import bpe_train

    @settings(**_SETTINGS)
    @given(
        words=st.lists(
            st.text(alphabet="ab", min_size=1, max_size=6),
            min_size=1,
            max_size=12,
        ),
        k=st.integers(min_value=1, max_value=5),
    )
    def run(words, k):
        docs = spark.createDataFrame(
            [(0, " ".join(words))], "doc_id bigint, text string"
        )
        got = [
            (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in bpe_train(docs, n_merges=k).orderBy("step").collect()
        ]
        assert got == _py_bpe_train(dict(Counter(words)), k)

    run()


def test_bloom_join_property(spark):
    """For arbitrary key multisets on both sides and arbitrary (even
    adversarially tiny) bitmap sizing, the bloom-prefiltered join
    must equal the plain inner join exactly."""
    from mapreduce_inverted_index_spark.operators.skew import (
        bloom_prefiltered_join,
    )

    @settings(**_SETTINGS)
    @given(
        lkeys=st.lists(
            st.integers(min_value=0, max_value=30), min_size=1, max_size=60
        ),
        rkeys=st.lists(
            st.integers(min_value=0, max_value=30), min_size=0, max_size=20
        ),
        m_bits=st.sampled_from([64, 100, 1 << 10, 1 << 16]),
        k=st.integers(min_value=1, max_value=4),
    )
    def run(lkeys, rkeys, m_bits, k):
        large = spark.createDataFrame(
            [(i, kk) for i, kk in enumerate(lkeys)], "id int, key int"
        )
        small = spark.createDataFrame(
            [(kk,) for kk in set(rkeys)] or [(None,)], "k int"
        )
        got = sorted(
            map(
                tuple,
                bloom_prefiltered_join(
                    large, small, "key", "k", m_bits=m_bits, k=k
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                large.join(small, F.col("key") == F.col("k")).collect(),
            )
        )
        assert got == want

    run()


def test_log_histogram_property(spark):
    """For arbitrary positive-integer samples: (a) total sketch count
    equals input size, (b) every q50/q90/q99 estimate sits within the
    bin-width relative error of SOME true value in its bin — verified
    by checking the estimate is within 1/(2*subbins) of the exact
    ceil-rank order statistic."""
    from mapreduce_inverted_index_spark.operators.sketches import (
        log_histogram_quantiles,
        log_histogram_sketch,
    )

    subbins = 8

    @settings(**_SETTINGS)
    @given(
        vals=st.lists(
            st.integers(min_value=1, max_value=10**9),
            min_size=1,
            max_size=200,
        )
    )
    def run(vals):
        df = spark.createDataFrame(
            [("g", v) for v in vals], "grp string, v long"
        )
        hist = log_histogram_sketch(df, "grp", "v", subbins=subbins)
        assert (
            hist.agg(F.sum("cnt")).collect()[0][0] == len(vals)
        )
        row = log_histogram_quantiles(hist, "grp").collect()[0]
        assert row["n"] == len(vals)
        svals = sorted(vals)
        import math

        for col, q in (("q50", 0.5), ("q90", 0.9), ("q99", 0.99)):
            exact = svals[math.ceil(q * len(svals)) - 1]
            rel = abs(row[col] - exact) / exact
            assert rel <= 1.0 / (2 * subbins) + 1e-9, (col, row[col], exact)

    run()
