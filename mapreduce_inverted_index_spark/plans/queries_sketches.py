"""Sketch-family catalog queries: mergeable pre-aggregation.

Tolerance-contract oracles (see operators/sketches.py docstring):
the DuckDB twin computes the exact value and asserts the within-band
boolean is TRUE, so a drifting sketch turns the driver row red.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.functions.text import sql_tokens, tokenize
from mapreduce_inverted_index_spark.operators import sketches as S
from mapreduce_inverted_index_spark.plans.registry import register
from mapreduce_inverted_index_spark.sources.tables import load_table

_QS = (0.5, 0.9, 0.99)


@register(
    "hll_rollup_merge_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS within_tol,
           TRUE AS merge_close_oneshot
    FROM events GROUP BY event_type
    """,
    doc="Daily HLL sketch rollup merged to per-type distinct users — "
        "the persist-sketches-not-raw pattern. Checks BOTH the 5% "
        "error band vs the exact count AND that merge-of-daily stays "
        "within 2% of a one-shot sketch (union is not bit-identical "
        "once dense, so the contract is a band).",
)
def q_hll_rollup_merge_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = S.hll_rollup(ev, ["event_type"], F.to_date("ts"), "user_id")
    merged = S.hll_merge(daily, ["event_type"], "approx_users")
    oneshot = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "oneshot_users"
        ),
        F.count_distinct("user_id").alias("exact_users"),
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users")
    return (
        merged.join(oneshot, "event_type")
        .select(
            "event_type",
            "exact_users",
            (err <= 0.05).alias("within_tol"),
            (
                F.abs(F.col("approx_users") - F.col("oneshot_users"))
                / F.col("exact_users")
                <= 0.02
            ).alias("merge_close_oneshot"),
        )
    )


@register(
    "frequent_bigrams",
    oracle=f"""
    WITH t AS (SELECT doc_id, {sql_tokens("text")} AS toks FROM documents),
    b AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1]))
             AS bigram
      FROM t
    ),
    total AS (SELECT count(*) AS n FROM b)
    SELECT bigram, count(*) AS n_occ
    FROM b CROSS JOIN total
    GROUP BY bigram, total.n
    HAVING count(*) >= ceil(total.n * 0.0015)
    """,
    doc="EXACT phi-heavy-hitter bigrams via per-partition Misra-Gries "
        "candidates + broadcast-verified exact recount — the "
        "no-full-keyspace-shuffle frequency pattern; output equals "
        "brute-force GROUP BY HAVING, so the oracle is exact.",
)
def q_frequent_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Project tokens once before slicing so the tokenize regex runs
    # one time per row (see word_shingles on CollapseProject inlining).
    t = docs.select(tokenize("text").alias("toks"))
    m = F.greatest(F.size("toks") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice("toks", 1, m),
        F.slice("toks", 2, m),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    occ = t.select(F.explode(bigrams).alias("bigram"))
    return S.frequent_items(occ, "bigram", phi=0.0015)


@register(
    "approx_quantiles_lineitem",
    oracle=f"""
    SELECT l_returnflag, unnest({list(_QS)!r}) AS q, TRUE AS within_tol
    FROM (SELECT DISTINCT l_returnflag FROM lineitem)
    """,
    doc="approx_percentile of l_extendedprice per returnflag with a "
        "self-verifying rank bound (|rank(approx_value) - q| within "
        "sketch guarantee + slack) — quantiles without a global sort.",
)
def q_approx_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return S.approx_quantiles_rank_checked(
        li, "l_returnflag", "l_extendedprice", _QS
    )


@register(
    "cms_user_counts",
    oracle="""
    WITH rows AS (SELECT unnest([0, 1, 2, 3]) AS r),
    ev AS (SELECT CAST(user_id AS VARCHAR) AS k, user_id FROM events),
    cells AS (
      SELECT r,
             CAST(concat('0x', substr(md5(concat(r, ':', k)), 1, 8)) AS UBIGINT)
               % 64 AS bucket,
             count(*) AS cnt
      FROM ev CROSS JOIN rows GROUP BY 1, 2),
    keys AS (SELECT DISTINCT k, user_id FROM ev),
    probes AS (
      SELECT user_id, r,
             CAST(concat('0x', substr(md5(concat(r, ':', k)), 1, 8)) AS UBIGINT)
               % 64 AS bucket
      FROM keys CROSS JOIN rows)
    SELECT p.user_id, CAST(min(c.cnt) AS BIGINT) AS cms_est
    FROM probes p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
    GROUP BY p.user_id
    """,
    doc="Count-Min Sketch (depth 4 x width 64) of per-user event "
        "frequency, point-estimated for every distinct user. Unlike "
        "the HLL/quantile contracts, this sketch is EXACTLY oracle-"
        "replayable: CMS has no float state, and the hash rows are "
        "fixed md5 prefixes both engines compute identically — the "
        "DuckDB twin rebuilds the same 256-cell grid and takes the "
        "same row-mins, value-equal. Build is one pass with "
        "map-side partial sketches (the mergeability story: "
        "executors sketch shards, the shuffle merges 256 longs, "
        "never raw keys); estimation is a broadcast join.",
)
def q_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    sketch = S.cms_build(ev, "user_id", depth=4, width=64).persist()
    keys = ev.distinct()
    return S.cms_estimate(sketch, keys, "user_id", depth=4, width=64)


@register(
    "term_association_lift",
    oracle=f"""
    WITH t AS (SELECT {sql_tokens("text")} AS toks FROM documents),
    occ AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1]))
             AS bigram
      FROM t),
    uni AS (
      SELECT unnest(toks) AS term FROM t),
    n_uni AS (SELECT count(*) AS n FROM uni),
    uc AS (SELECT term, count(*) AS c FROM uni GROUP BY term),
    bc AS (SELECT bigram, count(*) AS c_ab FROM occ
           GROUP BY bigram HAVING count(*) >= 20)
    SELECT bc.bigram, bc.c_ab,
           CAST(n_uni.n * bc.c_ab AS DOUBLE) / (a.c * b.c) AS lift
    FROM bc
    JOIN uc a ON a.term = string_split(bc.bigram, ' ')[1]
    JOIN uc b ON b.term = string_split(bc.bigram, ' ')[2]
    CROSS JOIN n_uni
    ORDER BY lift DESC, bc.bigram LIMIT 20
    """,
    doc="Collocation mining: top-20 bigrams by association LIFT "
        "(n·c(ab) / (c(a)·c(b)) — PMI without the log, because log() "
        "is libm-dependent across engines while ONE division of two "
        "exact bigint products is correctly rounded and bit-"
        "identical). min-support 20 occurrences. Plan: one tokenize "
        "pass persisted across the bigram and unigram counts, "
        "unigram count table broadcast onto the (small, support-"
        "filtered) bigram table, top-20 via a bounded heap. The "
        "classic 'new york'/'machine learning' phrase detector at "
        "corpus scale.",
)
def q_term_association_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(tokenize("text").alias("toks")).persist()
    m = F.greatest(F.size("toks") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice("toks", 1, m),
        F.slice("toks", 2, m),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    bc = (
        t.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= 20)
    )
    uni = t.select(F.explode("toks").alias("term"))
    n_uni = uni.agg(F.count("*").alias("n"))
    uc = uni.groupBy("term").agg(F.count("*").alias("c"))
    parts = F.split(F.col("bigram"), " ")
    scored = (
        bc.withColumn("_a", parts.getItem(0))
        .withColumn("_b", parts.getItem(1))
        .join(F.broadcast(uc.selectExpr("term AS _a", "c AS _ca")), "_a")
        .join(F.broadcast(uc.selectExpr("term AS _b", "c AS _cb")), "_b")
        .crossJoin(F.broadcast(n_uni))
        .select(
            "bigram",
            "c_ab",
            (
                (F.col("n") * F.col("c_ab")).cast("double")
                / (F.col("_ca") * F.col("_cb"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "bigram").limit(20)


_KMV_K = 64
_KMV_D = "1152921504606846976.0"  # 2^60, the md5-15-hex hash domain
_KMV_H = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
)


def _kmv_est_sql(arr: str) -> str:
    return (
        f"CASE WHEN len({arr}) < {_KMV_K} THEN CAST(len({arr}) AS DOUBLE) "
        f"ELSE {_KMV_K - 1}.0 * {_KMV_D} / CAST({arr}[{_KMV_K}] AS DOUBLE) END"
    )


@register(
    "kmv_user_overlap",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, {_KMV_H} AS h FROM events),
    rn AS (SELECT event_type, h,
                  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
           FROM h),
    sk AS (SELECT event_type, list(h ORDER BY h) AS kmv
           FROM rn WHERE rn <= {_KMV_K} GROUP BY event_type),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.kmv AS ka, b.kmv AS kb,
             list_slice(list_sort(list_distinct(a.kmv || b.kmv)),
                        1, {_KMV_K}) AS x
      FROM sk a, sk b WHERE a.event_type < b.event_type),
    e AS (
      SELECT type_a, type_b, ka, kb, x,
             {_kmv_est_sql('ka')} AS ea,
             {_kmv_est_sql('kb')} AS eb,
             {_kmv_est_sql('x')} AS eu,
             CAST(len(list_intersect(list_intersect(x, ka), kb)) AS DOUBLE)
               / CAST(len(x) AS DOUBLE) AS j
      FROM p)
    SELECT type_a, type_b,
           CAST(floor(ea + 0.5) AS BIGINT) AS est_a,
           CAST(floor(eb + 0.5) AS BIGINT) AS est_b,
           CAST(floor(eu + 0.5) AS BIGINT) AS est_union,
           CAST(floor(j * 1000000.0 + 0.5) AS BIGINT) AS jaccard_e6,
           CAST(floor(j * eu + 0.5) AS BIGINT) AS est_intersection
    FROM e
    """,
    doc="KMV (k-minimum-values) distinct sketches per event type + "
        "pairwise SET-OPERATION estimates from the sketches alone — "
        "the capability HLL lacks (HLL unions but cannot intersect): "
        "per-pair distinct/union/Jaccard/intersection estimates "
        "without re-reading raw events. md5-based and RNG-free, so "
        "unlike HLL the whole estimator replays EXACTLY in DuckDB "
        "(integer outputs, value-exact oracle — no tolerance band). "
        "Build shape: one map-side-combined distinct on (type, "
        "hash), a spill-safe per-group row_number<=k window "
        "(memory O(k), never a whole-set collect), then pair math "
        "on |types| sketch rows only. Operators: sketches.kmv_sketch "
        "/ sketches.kmv_pairwise_overlap.",
)
def q_kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = S.kmv_sketch(ev, ["event_type"], "user_id", k=_KMV_K)
    return S.kmv_pairwise_overlap(sk, "event_type", k=_KMV_K).select(
        F.col("a").alias("type_a"),
        F.col("b").alias("type_b"),
        "est_a", "est_b", "est_union", "jaccard_e6", "est_intersection",
    )


@register(
    "log_histogram_quantiles_events",
    oracle="""
    WITH cents AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events WHERE value >= 0.01),
    staged AS (
      SELECT event_type, v,
             (CAST(1 AS BIGINT) << CAST(length(to_base(v, 2)) - 1 AS INTEGER)) AS base,
             (length(to_base(v, 2)) - 1) * 8 AS e_k
      FROM cents),
    hist AS (
      SELECT event_type,
             CAST(e_k + (v * 8) // base - 8 AS INTEGER) AS bin,
             count(*) AS cnt,
             round(min(CAST(base AS DOUBLE)
                   * (1.0 + (2 * ((v * 8) // base - 8) + 1) / 16.0)), 6) AS est
      FROM staged GROUP BY 1, 2),
    cum AS (
      SELECT event_type, est,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM hist)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum >= ceil(0.5 * n) THEN est END) AS q50,
           min(CASE WHEN cum >= ceil(0.9 * n) THEN est END) AS q90,
           min(CASE WHEN cum >= ceil(0.99 * n) THEN est END) AS q99
    FROM cum GROUP BY event_type
    """,
    doc="Mergeable log-histogram quantiles (p50/p90/p99 of the cent "
        "value per event type): each value lands in one of 8 linear "
        "sub-bins of its binary octave, state is (key, bin, cnt) — "
        "<= 63x8 rows per key, merged across shards/streams/time "
        "buckets by ADDING counts — and the whole sketch is "
        "deterministic integer math, so the oracle replays it "
        "value-exactly (Spark's own GK approx_percentile cannot be "
        "SQL-replayed; its rank contract lives in "
        "approx_quantiles_rank_checked). Midpoint estimates carry "
        "relative error <= 1/16, pytest-pinned vs exact quantiles. "
        "Operators: sketches.log_histogram_sketch/_quantiles.",
)
def q_log_histogram_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = ev.where(F.col("value") >= 0.01).select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    hist = S.log_histogram_sketch(cents, "event_type", "cents", subbins=8)
    return S.log_histogram_quantiles(hist, "event_type", qs=_QS)
