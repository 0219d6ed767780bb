"""Round-5 operator semantics beyond the registry differential:

* frequent_items: the Misra-Gries TRIMMING path (dict > k counters)
  never fires at sf0.01 (916 distinct bigrams < the default k), so a
  synthetic skewed stream with k << distinct-keys proves the
  candidate superset guarantee and the exact-recount equality.
* tfidf_cosine_pairs: identical documents must score cosine 1.0,
  disjoint documents must not pair at all.
* label_centroids: identical results under different partitionings
  (the decimal-sum order-independence claim).
* stream_attribution_join: streaming result equals the same interval
  join computed in batch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.operators.sketches import frequent_items
from mapreduce_inverted_index_spark.operators.similarity import label_centroids
from mapreduce_inverted_index_spark.operators.term_queries import (
    tfidf_cosine_pairs,
)


def test_frequent_items_trims_and_stays_exact(spark):
    # 3 heavy keys (600 occurrences each) buried in 2000 singleton
    # keys; phi=0.1 over ~3800 rows -> threshold 380, k = 20 counters
    # per partition << 2003 distinct keys, so MG trimming fires on
    # every partition.
    rows = [(f"hot{i % 3}",) for i in range(1800)] + [
        (f"cold{i}",) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "item string").repartition(8)
    out = frequent_items(df, "item", phi=0.1).collect()
    got = {(r["item"], r["n_occ"]) for r in out}
    assert got == {("hot0", 600), ("hot1", 600), ("hot2", 600)}


def test_frequent_items_equals_bruteforce_on_uniformish(spark):
    # Near-uniform stream with a phi low enough that many keys
    # qualify: output must equal GROUP BY ... HAVING exactly.
    rows = [(f"k{i % 40}",) for i in range(4000)] + [
        (f"rare{i}",) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = sorted(
        (r["item"], r["n_occ"])
        for r in frequent_items(df, "item", phi=0.02).collect()
    )
    import math

    threshold = math.ceil(4500 * 0.02)
    brute = sorted(
        (r["item"], r["n"])
        for r in df.groupBy("item")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= threshold)
        .collect()
    )
    assert got == brute and len(got) == 40


def test_tfidf_cosine_identical_docs_score_one(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma delta"),
            (2, "epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): float(r["cosine"])
        for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()
    }
    assert out == {(0, 1): 1.0}  # disjoint docs share no term -> no pair


def test_fuzzy_key_pairs_catches_typos_jaccard_misses(spark):
    from mapreduce_inverted_index_spark.operators.dedup import fuzzy_key_pairs

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over dogs", "a"),
            (1, "the quikc brwon fox jumps over dogs", "a"),  # 4 edits
            (2, "completely different content here now", "a"),
            (3, "the quick brown fox jumps over dogs", "b"),  # other block
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["distance"]
        for r in fuzzy_key_pairs(docs, max_dist=5, key_len=32).collect()
    }
    assert (0, 1) in out and 0 < out[(0, 1)] <= 5  # typo pair found
    assert (0, 3) not in out  # blocking respected
    assert all(2 not in pair for pair in out)  # unrelated text excluded


def test_label_centroids_partition_invariant(spark, sf_smoke):
    from mapreduce_inverted_index_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    a = sorted(map(tuple, label_centroids(emb).collect()))
    b = sorted(map(tuple, label_centroids(emb.repartition(17)).collect()))
    assert a == b


def test_stream_attribution_equals_batch(spark, sf_smoke):
    from mapreduce_inverted_index_spark.sources.tables import load_table
    from mapreduce_inverted_index_spark.streaming.windows import (
        stream_attribution_join,
    )

    got = sorted(
        map(tuple, stream_attribution_join(spark, sf_smoke).collect())
    )
    ev = load_table(spark, sf_smoke, "events")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = (
        c.join(
            p,
            F.expr(
                "user_id = p_user_id AND purchase_ts > click_ts "
                "AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
            ),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            (
                # batch loader surfaces ts as TIMESTAMP_NTZ; session TZ
                # is pinned UTC so the cast is identity
                F.unix_micros(F.col("purchase_ts").cast("timestamp"))
                - F.unix_micros(F.col("click_ts").cast("timestamp"))
            ).alias("lag_us"),
        )
    )
    assert got == sorted(map(tuple, batch.collect()))


def test_frequent_items_bigint_keys(spark):
    # Type-generic candidate schema: bigint keys must survive the
    # Arrow round-trip and the verify equi-join without a string
    # cast. 3 heavy long keys among 1500 singleton longs.
    rows = [(1_000_000_000_000 + (i % 3),) for i in range(900)] + [
        (i,) for i in range(1500)
    ]
    df = spark.createDataFrame(rows, "item bigint").repartition(6)
    out = frequent_items(df, "item", phi=0.1).collect()
    got = {(r["item"], r["n_occ"]) for r in out}
    assert got == {
        (1_000_000_000_000, 300),
        (1_000_000_000_001, 300),
        (1_000_000_000_002, 300),
    }
    # schema carries the input type, not string
    assert frequent_items(df, "item", phi=0.1).schema["item"].dataType.simpleString() == "bigint"


def test_frequent_items_threshold_exact_at_boundary(spark):
    # phi*N exactly integral: 2000 rows, phi=0.1 -> threshold must be
    # exactly 200 (not 201 via double round-up). A key with exactly
    # 200 occurrences must be INCLUDED.
    rows = [("edge",)] * 200 + [(f"c{i}",) for i in range(1800)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = {(r["item"], r["n_occ"]) for r in frequent_items(df, "item", phi=0.1).collect()}
    assert ("edge", 200) in got


def test_fuzzy_unblocked_matches_bruteforce_with_indels(spark):
    # Indels SHIFT every later segment, so this corpus is built to
    # break same-position band joins: edits are mostly inserts and
    # deletes near the front of the string. The PassJoin +-k probe
    # window must still reach 100% recall (== brute force).
    import random

    from mapreduce_inverted_index_spark.operators.dedup import (
        fuzzy_unblocked_pairs,
        normalize_for_dedup,
    )

    random.seed(7)
    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs before sunset",
        "how vexingly quick daft zebras jump over tall fences",
    ]
    rows = []
    i = 0
    for b in base:
        for _ in range(10):
            s = list(b)
            for _ in range(random.randint(1, 3)):
                p = random.randrange(8)  # edits at the FRONT: max shift
                op = random.choice("iid")  # indel-heavy
                if op == "i":
                    s.insert(p, random.choice("xyz"))
                elif s:
                    del s[p]
            rows.append((i, "".join(s)))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    K, KL = 3, 32
    got = sorted(
        (r.doc_a, r.doc_b, r.distance)
        for r in fuzzy_unblocked_pairs(docs, max_dist=K, key_len=KL).collect()
    )
    keyed = docs.where(F.length(normalize_for_dedup("text")) >= KL).select(
        "doc_id", F.substring(normalize_for_dedup("text"), 1, KL).alias("k")
    )
    a = keyed.select(F.col("doc_id").alias("doc_a"), F.col("k").alias("ka"))
    b = keyed.select(F.col("doc_id").alias("doc_b"), F.col("k").alias("kb"))
    brute = sorted(
        (r.doc_a, r.doc_b, r.d)
        for r in a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", F.levenshtein("ka", "kb").cast("int").alias("d")
        )
        .where(F.col("d") <= K)
        .collect()
    )
    assert got == brute and len(got) > 0


def test_fuzzy_unblocked_candidates_bounded(spark):
    # On a corpus of pairwise-distant keys the band join must stay
    # near-empty: candidate pairs are bounded by band collisions, not
    # the N^2 pair space. 400 random distinct keys -> expect far
    # fewer candidate pairs than 400*399/2.
    import random

    from mapreduce_inverted_index_spark.operators.dedup import (
        fuzzy_unblocked_pairs,
    )

    random.seed(11)
    rows = [
        (i, "".join(random.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(40)))
        for i in range(400)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = fuzzy_unblocked_pairs(docs, max_dist=2, key_len=32)
    # random 10-11 char segments collide with probability ~26^-10:
    # the verified output must be empty, and the plan must be a
    # (seg, content) equi-join (no cartesian explosion).
    assert out.count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
