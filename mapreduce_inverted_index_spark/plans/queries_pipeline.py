"""Pipeline-tier query catalog: corpus hygiene (passage-level
boilerplate), graph analytics (co-occurrence edges, triangle
counting), and the lakehouse write path (MERGE upserts, training
shards, deterministic group sampling).

These extend the training-data surface beyond the reference's
tokenize → index pipeline (the reference has no hygiene, graph, or
merge tier at all); every query carries an exact DuckDB oracle —
integer/md5/decimal math only, no float-order hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.functions.text import sql_terms, sql_tokens
from mapreduce_inverted_index_spark.operators import graph as G
from mapreduce_inverted_index_spark.operators import layout as L
from mapreduce_inverted_index_spark.operators import passages as P
from mapreduce_inverted_index_spark.operators import snapshots as SN
from mapreduce_inverted_index_spark.plans.oracle_compat import dsum, sql_dsum
from mapreduce_inverted_index_spark.plans.registry import register
from mapreduce_inverted_index_spark.sources.tables import load_table

_TOKS = sql_tokens("text")

# DuckDB twin of doc_passages: non-overlapping 8-word chunks of the
# token stream, md5-hashed. range() is end-exclusive and Spark's
# sequence() end-inclusive, so range(1, len+1, 8) == sequence(1, len, 8);
# both engines clamp list slices at the end of the list.
_SQL_PASSAGES = f"""
  SELECT doc_id, md5(array_to_string(toks[pos:pos+7], ' ')) AS passage_hash
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 8)) AS pos
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        WHERE len(toks) > 0)
"""

# DuckDB twin of cooccurrence_edges: distinct (u, v) user pairs
# sharing an (event_type, minute) context. The oracle keys on the
# tuple directly; Spark concatenates it into one block column for
# bounded_block_join — same partition of the rows either way.
# Minute (not hour) buckets so context population stays bounded as
# event rate scales — see the graph.cooccurrence_edges docstring.
_SQL_EDGES = """
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM (SELECT DISTINCT event_type, date_trunc('minute', ts) AS h, user_id
        FROM events) a
  JOIN (SELECT DISTINCT event_type, date_trunc('minute', ts) AS h, user_id
        FROM events) b
    ON a.event_type = b.event_type AND a.h = b.h AND a.user_id < b.user_id
"""

_SQL_MD5_LONG = (
    "CAST(concat('0x', substring(md5(CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT)"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders")


# --------------------------------------------------------- corpus hygiene

@register(
    "common_passages",
    oracle=f"""
    WITH p AS ({_SQL_PASSAGES})
    SELECT passage_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM p GROUP BY passage_hash HAVING count(DISTINCT doc_id) >= 2
    """,
    doc="Boilerplate candidate set: 8-word passages appearing in >= 2 "
        "distinct documents (C4's repeated-line filter at passage "
        "granularity). Shuffle rows are (md5, doc_id) — text never "
        "leaves the map side.",
)
def q_common_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.passage_doc_freq(_docs(spark, sf_dir), k=8, min_docs=2)


@register(
    "boilerplate_profile",
    oracle=f"""
    WITH p AS ({_SQL_PASSAGES}),
         c AS (SELECT passage_hash FROM p
               GROUP BY passage_hash HAVING count(DISTINCT doc_id) >= 2)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_passages,
           CAST(count(*) FILTER (WHERE passage_hash IN (SELECT passage_hash FROM c))
                AS BIGINT) AS n_common,
           round((count(*) - count(*) FILTER (WHERE passage_hash IN
                  (SELECT passage_hash FROM c)))
                 / CAST(count(*) AS DOUBLE), 6) AS retained_ratio
    FROM p GROUP BY doc_id
    """,
    doc="Per-document boilerplate annotation: passage slots flagged "
        "against the broadcast common-passage set, fraction retained "
        "after a strip pass. Flagging join is broadcast (boilerplate "
        "set is the small cross-document residue); one shuffle total.",
)
def q_boilerplate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.boilerplate_profile(_docs(spark, sf_dir), k=8, min_docs=2)


# DuckDB twin of duplicate_spans' rolling windows: EVERY position's
# 8-token window (stride 1 — vs _SQL_PASSAGES' stride 8), md5-hashed.
# range() end-exclusive: range(1, len-6) == positions 1..len-7, the
# starts of full 8-windows; matches sequence(1, size - 7) on the
# Spark side.
_SQL_ROLLWIN = f"""
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         md5(array_to_string(toks[pos:pos+7], ' ')) AS wh
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS pos
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        WHERE len(toks) >= 8)
"""


@register(
    "duplicate_spans_docs",
    oracle=f"""
    WITH w AS ({_SQL_ROLLWIN}),
         dup AS (SELECT wh FROM w
                 GROUP BY wh HAVING count(DISTINCT doc_id) >= 2),
         f AS (SELECT doc_id, pos FROM w
               WHERE wh IN (SELECT wh FROM dup)),
         isl AS (SELECT doc_id, pos,
                        pos - row_number() OVER (PARTITION BY doc_id
                                                 ORDER BY pos) AS grp
                 FROM f)
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS start_tok,
           CAST(max(pos) + 7 AS BIGINT) AS end_tok,
           CAST(max(pos) - min(pos) + 8 AS INT) AS n_tokens
    FROM isl GROUP BY doc_id, grp
    """,
    doc="Exact substring dedup (Lee-et-al duplicate-span removal): "
        "maximal token spans whose every 8-token rolling window "
        "appears in >= 2 distinct documents — (doc_id, start, end) "
        "offsets for surgical span removal, one granularity finer "
        "than the passage tier. Rolling hashes bucketed by hash, "
        "never all-pairs; span merge is per-document "
        "gaps-and-islands, no global sort.",
)
def q_duplicate_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.duplicate_spans(_docs(spark, sf_dir), k=8, min_docs=2)


# ------------------------------------------------------------------ graph

@register(
    "user_cooccurrence_edges",
    oracle=_SQL_EDGES,
    doc="Interaction-graph edge derivation: distinct user pairs "
        "co-active on the same event_type within the same minute "
        "(minute, not hour: the context window must keep its "
        "population bounded as event rate grows or the graph "
        "saturates into a clique). Blocked self-join via "
        "bounded_block_join (hot contexts chunk into k^2 bounded "
        "sub-joins, no straggler reducer).",
)
def q_user_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.cooccurrence_edges(_events(spark, sf_dir))


@register(
    "event_graph_triangles",
    oracle=f"""
    WITH edges AS ({_SQL_EDGES}),
         deg AS (SELECT x, count(*) AS deg
                 FROM (SELECT u AS x FROM edges
                       UNION ALL SELECT v AS x FROM edges)
                 GROUP BY x),
         e AS (SELECT u, v, du.deg AS du, dv.deg AS dv
               FROM edges
               JOIN deg du ON du.x = edges.u
               JOIN deg dv ON dv.x = edges.v),
         o AS (SELECT CASE WHEN (du, u) < (dv, v) THEN u ELSE v END AS src,
                      CASE WHEN (du, u) < (dv, v) THEN v ELSE u END AS dst,
                      CASE WHEN (du, u) < (dv, v) THEN dv ELSE du END AS dst_deg
               FROM e),
         w AS (SELECT o1.dst AS b, o2.dst AS c
               FROM o o1 JOIN o o2 ON o1.src = o2.src
               WHERE (o1.dst_deg, o1.dst) < (o2.dst_deg, o2.dst))
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT)
            FROM w JOIN o ON o.src = w.b AND o.dst = w.c) AS n_triangles
    """,
    doc="Exact triangle count by degree orientation (Suri & "
        "Vassilvitskii): edges point low-(deg,id) -> high, wedges "
        "enumerate per apex, closing edges verify. Out-degree is "
        "O(sqrt(m)) after orientation — the celebrity-vertex wedge "
        "explosion cannot happen. All integer math; exact oracle.",
)
def q_event_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_stats(G.cooccurrence_edges(_events(spark, sf_dir)))


# -------------------------------------------------------- lakehouse write

@register(
    "snapshot_merge_orders",
    oracle=f"""
    WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                         1 AS _version, FALSE AS _deleted, 0 AS _src
                  FROM orders),
         delta AS (SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice,
                          2 AS _version, (o_orderkey % 21 = 0) AS _deleted, 1 AS _src
                   FROM orders WHERE o_orderkey % 7 = 0),
         merged AS (SELECT *, row_number() OVER (
                        PARTITION BY o_orderkey
                        ORDER BY _version DESC, _src DESC,
                                 md5(CAST(o_orderkey AS VARCHAR))) AS _rn
                    FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)),
         snap AS (SELECT * FROM merged WHERE _rn = 1 AND NOT _deleted)
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
           {sql_dsum('o_totalprice', 'total_price')}
    FROM snap GROUP BY o_orderstatus
    """,
    doc="MERGE/upsert semantics (last-writer-wins, tombstone deletes): "
        "base snapshot + delta (every 7th order re-statused 'X', every "
        "21st tombstoned) resolved by one windowed shuffle on the key "
        "— the lakehouse compaction step; the reference can only "
        "rebuild from scratch. Summary rolled up per status with "
        "decimal-exact sums.",
)
def q_snapshot_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir)
    base = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.lit(1).alias("_version"), F.lit(False).alias("_deleted"),
    )
    delta = orders.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", F.lit("X").alias("o_orderstatus"), "o_totalprice",
        F.lit(2).alias("_version"),
        (F.col("o_orderkey") % 21 == 0).alias("_deleted"),
    )
    snap = SN.snapshot_merge(base, delta, ["o_orderkey"])
    return snap.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        dsum("o_totalprice", "total_price"),
    )


@register(
    "shard_manifest_docs",
    oracle=f"""
    SELECT ({_SQL_MD5_LONG.format(col='doc_id')}) % 16 AS shard,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_chars) AS BIGINT) AS total_bytes,
           min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM documents GROUP BY 1
    """,
    doc="Training-shard manifest: md5-hash shard assignment (16 "
        "shards) + per-shard row/byte/id-range rollup. Assignment is "
        "a scan-side expression (zero shuffle); the manifest agg "
        "ships 16 partials per partition. Models the "
        "repartition(shard).write layout step of a training corpus.",
)
def q_shard_manifest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SN.shard_manifest(_docs(spark, sf_dir), n_shards=16)


@register(
    "lm_quality_scores",
    oracle=f"""
    WITH tf AS (SELECT doc_id, term, count(*) AS tf
                FROM (SELECT doc_id,
                             unnest({sql_terms('text', distinct=False)}) AS term
                      FROM documents)
                GROUP BY 1, 2),
         lm AS (SELECT term,
                       CAST(round(ln(sum(tf) + 1), 9) AS DECIMAL(18,9)) AS lp
                FROM tf GROUP BY term),
         z AS (SELECT CAST(round(ln(CAST(sum(tf) AS BIGINT)
                                     + count(DISTINCT term)), 9)
                           AS DECIMAL(18,9)) AS lnz
               FROM tf)
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           round(CAST((SELECT lnz FROM z) AS DOUBLE)
                 - CAST(sum(CAST(tf AS DECIMAL(9,0)) * lp) AS DOUBLE)
                   / CAST(sum(tf) AS BIGINT), 6) AS neg_logprob_per_tok
    FROM tf JOIN lm USING (term)
    GROUP BY doc_id
    """,
    doc="CCNet-style LM quality score: per-doc average negative log "
        "probability under an add-one unigram model of the corpus "
        "(perplexity-proxy filtering). Transcendentals are computed "
        "once per distinct count, 9-decimal-quantized, and summed as "
        "exact decimals — order-independent, so the score is "
        "bit-stable across engines and partitionings. LM and corpus "
        "scalars broadcast; tf table persisted across its three "
        "consumers (the bm25 lesson).",
)
def q_lm_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_inverted_index_spark.operators.textstats import (
        lm_unigram_scores,
    )

    return lm_unigram_scores(_docs(spark, sf_dir))


@register(
    "quality_classifier_margins",
    oracle=f"""
    WITH w AS (SELECT range AS bucket,
                      (range * 2654435761) % 2001 - 1000 AS w_milli
               FROM range(1024)),
         t AS (SELECT doc_id,
                      CAST(concat('0x', substring(md5(term), 1, 15))
                           AS BIGINT) % 1024 AS bucket
               FROM (SELECT doc_id,
                            unnest({sql_terms('text', distinct=False)})
                                AS term
                     FROM documents))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(CAST(sum(w_milli) AS BIGINT) AS DOUBLE) / 1000.0
               AS margin,
           CAST(sum(w_milli) AS BIGINT) > 0 AS quality_pass
    FROM t JOIN w USING (bucket)
    GROUP BY doc_id
    """,
    doc="fastText-style hashed linear classifier inference (the "
        "quality/toxicity gate of a pretraining mix): token -> "
        "md5 feature bucket (hashing trick: fixed feature space, "
        "vocabulary-free) -> broadcast weight lookup -> per-doc "
        "margin. Integer milli-weights make margins exact bigint "
        "sums (order/partitioning-independent); the synthetic "
        "weight table stands in for trained weights, loaded and "
        "broadcast identically in real use. One scan + broadcast "
        "join + partial-agg groupBy; no token shuffle. "
        "Operator: textstats.hashed_classifier_scores.",
)
def q_quality_classifier_margins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mapreduce_inverted_index_spark.operators.textstats import (
        hashed_classifier_scores,
    )

    return hashed_classifier_scores(_docs(spark, sf_dir), n_buckets=1024)


@register(
    "vocab_growth_curve",
    oracle=f"""
    WITH tf AS (SELECT doc_id,
                       unnest({sql_terms('text', distinct=False)}) AS term
                FROM documents),
         pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nt
                FROM tf GROUP BY 1),
         fd AS (SELECT term, min(doc_id) AS doc_id FROM tf GROUP BY 1),
         nv AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nv
                FROM fd GROUP BY 1),
         base AS (SELECT d.doc_id,
                         coalesce(nt, 0) AS n_tokens,
                         coalesce(nv, 0) AS n_new_terms
                  FROM documents d
                  LEFT JOIN pd USING (doc_id)
                  LEFT JOIN nv USING (doc_id))
    SELECT doc_id, n_tokens, n_new_terms,
           CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT)
               AS tokens_seen,
           CAST(sum(n_new_terms) OVER (ORDER BY doc_id) AS BIGINT)
               AS vocab_size
    FROM base
    """,
    doc="Heaps'-law vocabulary growth curve: tokens seen and distinct "
        "vocabulary after each doc in ingest order — the "
        "is-new-data-still-adding-vocabulary curve. Term novelty is "
        "min(doc_id) per term (one groupBy, no ordered scan); the two "
        "cumulative axes run as bucketed_prefix_sum (fifth and sixth "
        "consumers of the distributed prefix primitive — parallel "
        "per-bucket windows), while the oracle IS the naive "
        "single-partition window. Operator: textstats."
        "vocab_growth_curve.",
)
def q_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_inverted_index_spark.operators.textstats import (
        vocab_growth_curve,
    )

    return vocab_growth_curve(_docs(spark, sf_dir))


_Z_BITS = 8
_Z_FILES = 16
_Z_SHIFT = 2 * _Z_BITS - (_Z_FILES - 1).bit_length()
_SQL_CDF_CELL = (
    "CAST(((sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)) - c) "
    f"* {2**_Z_BITS} // (SELECT _n FROM n) AS BIGINT)"
)


@register(
    "zorder_layout_orders",
    oracle=f"""
    WITH n AS (SELECT count(*) AS _n FROM orders),
         hx AS (SELECT o_custkey AS v, count(*) AS c FROM orders GROUP BY 1),
         gx AS (SELECT v, {_SQL_CDF_CELL} AS g FROM hx),
         hy AS (SELECT o_orderdate AS v, count(*) AS c FROM orders GROUP BY 1),
         gy AS (SELECT v, {_SQL_CDF_CELL} AS g FROM hy),
         keyed AS (SELECT {L.sql_interleave_bits('gx.g', 'gy.g', _Z_BITS)} AS z,
                          o_custkey, o_orderdate
                   FROM orders
                   JOIN gx ON orders.o_custkey = gx.v
                   JOIN gy ON orders.o_orderdate = gy.v)
    SELECT z >> {_Z_SHIFT} AS file_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_custkey) AS min_x, max(o_custkey) AS max_x,
           min(o_orderdate) AS min_y, max(o_orderdate) AS max_y
    FROM keyed GROUP BY 1
    """,
    doc="Z-order (Morton) layout profile over orders(custkey, "
        "orderdate): rank-grid cells from each dimension's value "
        "histogram (integer CDF math — no window ever touches the "
        "fact table), bit-interleaved key, z-prefix file cuts, and "
        "per-file min/max envelopes on BOTH dimensions — the "
        "statistics that make 2-D min-max pruning work "
        "(Delta/Iceberg OPTIMIZE ZORDER). All exact integer/"
        "timestamp math, replayed verbatim by the oracle.",
)
def q_zorder_layout_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return L.zorder_layout_profile(
        _orders(spark, sf_dir).select("o_custkey", "o_orderdate"),
        "o_custkey",
        "o_orderdate",
        n_files=_Z_FILES,
        bits=_Z_BITS,
    )


@register(
    "group_sample_docs",
    oracle="""
    SELECT doc_id, source, sample_rank FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER)
               AS sample_rank
      FROM documents)
    WHERE sample_rank <= 20
    """,
    doc="Deterministic per-group reservoir-equivalent sample: 20 docs "
        "per source, ranked by md5(id) — uniform under the hash, "
        "reproducible to the byte across engines and re-runs (true "
        "reservoir sampling is sequential and non-replayable). One "
        "windowed shuffle on the group key.",
)
def q_group_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SN.group_sample(_docs(spark, sf_dir), "source", 20).select(
        "doc_id", "source", F.col("sample_rank").cast("int").alias("sample_rank")
    )


@register(
    "scd2_order_status_history",
    oracle="""
    WITH ch AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
                       lag(o_orderstatus) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS _prev
                FROM orders),
         op AS (SELECT * FROM ch
                WHERE _prev IS NULL OR o_orderstatus <> _prev)
    SELECT o_custkey, o_orderstatus,
           o_orderdate AS effective_from,
           lead(o_orderdate) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS effective_to,
           lead(o_orderdate) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
    FROM op
    """,
    doc="SCD type-2 dimension build: per-customer order-status "
        "history collapsed into half-open validity intervals "
        "[effective_from, effective_to) with is_current on the open "
        "one — the warehouse dimension-table form (pair with "
        "asof_join for the fact-side lookup). Run-length collapse "
        "via lag, interval close via lead; both windows share one "
        "key shuffle. Operator: snapshots.scd2_history.",
)
def q_scd2_order_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SN.scd2_history(
        _orders(spark, sf_dir),
        key_cols=["o_custkey"],
        attr_col="o_orderstatus",
        ts_col="o_orderdate",
        tiebreak_col="o_orderkey",
    )


@register(
    "compaction_plan_files",
    oracle="""
    WITH f AS (SELECT source AS part, doc_id AS file_id,
                      n_chars AS size_bytes
               FROM documents),
         j AS (SELECT part, file_id, size_bytes,
                      -- sum() OVER yields HUGEINT in DuckDB; pin the
                      -- cumsum and the quotient back to BIGINT so the
                      -- job_id column type matches Spark's
                      CAST(CAST(sum(size_bytes) OVER (
                             PARTITION BY part ORDER BY file_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - size_bytes AS BIGINT)
                           // 2000 AS BIGINT) AS job_id
               FROM f)
    SELECT part, job_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
           min(file_id) AS min_file_id,
           max(file_id) AS max_file_id
    FROM j GROUP BY 1, 2
    """,
    doc="Small-files compaction planner (OPTIMIZE bin-packing): the "
        "doc-per-file ingest listing packed into ~2000-byte rewrite "
        "jobs per source partition by a running-sum cut over file "
        "METADATA — the plan costs O(files), never touches data, and "
        "each planned job is an embarrassingly-parallel rewrite task. "
        "Integer `div` on the cumsum so the job boundary is exact at "
        "any byte count. Operator: layout.compaction_plan.",
)
def q_compaction_plan_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = _docs(spark, sf_dir).select(
        F.col("source").alias("part"),
        F.col("doc_id").alias("file_id"),
        F.col("n_chars").alias("size_bytes"),
    )
    return L.compaction_plan(
        files, target_bytes=2000, partition_col="part",
        file_col="file_id", bytes_col="size_bytes",
    ).withColumnRenamed("partition", "part")


@register(
    "rag_chunk_docs",
    oracle=f"""
    SELECT doc_id,
           CAST((pos - 1) // 48 AS INTEGER) AS chunk_no,
           CAST(pos AS INTEGER) AS start_tok,
           CAST(len(toks[pos:pos+63]) AS INTEGER) AS n_tokens,
           md5(array_to_string(toks[pos:pos+63], ' ')) AS chunk_hash
    FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 48)) AS pos
          FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
          WHERE len(toks) > 0)
    """,
    doc="RAG-ingest chunking: overlapping 64-word windows every 48 "
        "words (16-word overlap so no answer span is boundary-cut), "
        "stable (doc_id, chunk_no) identity so re-runs and "
        "incremental re-embeds reproduce the same chunk ids. Chunks "
        "ship as md5 hashes — text never leaves the map side; the "
        "embedder reads the text column beside them in a real "
        "ingest. Operator: passages.chunk_documents.",
)
def q_rag_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.chunk_documents(
        _docs(spark, sf_dir), width=64, stride=48
    ).withColumn("start_tok", F.col("start_tok").cast("int"))


def _pagerank_oracle(iters: int = 5) -> str:
    """DuckDB twin of graph.pagerank_fixed_point over the
    co-occurrence graph: the iterative loop unrolled into one CTE
    per power step — possible (and exact) ONLY because every step is
    integer arithmetic; a float PageRank would diverge across
    engines at the first per-vertex sum."""
    sql = f"""
    WITH edges AS ({_SQL_EDGES}),
    de AS (SELECT u AS src, v AS dst FROM edges
           UNION ALL SELECT v AS src, u AS dst FROM edges),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM de GROUP BY 1),
    n AS (SELECT count(*) AS _n FROM deg),
    r0 AS (SELECT src AS id, deg,
                  CAST(1000000000 // (SELECT _n FROM n) AS BIGINT) AS rank_nano
           FROM deg)"""
    prev = "r0"
    for i in range(1, iters + 1):
        sql += f""",
    s{i} AS (SELECT de.dst, CAST(sum(r.rank_nano // r.deg) AS BIGINT) AS s
             FROM {prev} r JOIN de ON de.src = r.id GROUP BY 1),
    r{i} AS (SELECT deg.src AS id, deg.deg,
                    CAST({15 * 10**9} // (100 * (SELECT _n FROM n))
                         + (85 * coalesce(s{i}.s, 0)) // 100 AS BIGINT)
                      AS rank_nano
             FROM deg LEFT JOIN s{i} ON s{i}.dst = deg.src)"""
        prev = f"r{i}"
    sql += f"""
    SELECT id AS user_id, rank_nano,
           CAST(rank_nano AS DOUBLE) / 1000000000.0 AS rank
    FROM {prev}
    """
    return sql


@register(
    "pagerank_user_graph",
    oracle=_pagerank_oracle(5),
    doc="Fixed-point PageRank (5 power iterations, d=0.85) over the "
        "user co-occurrence graph: ranks as integer nano-units, so "
        "contribution split / damping / teleport are all exact "
        "integer division — order- and partitioning-independent, "
        "replayed verbatim by an unrolled-CTE oracle. The iterative "
        "DataFrame loop persists edges+degrees across rounds, "
        "truncates lineage per round, and keeps only a counter on "
        "the driver. Operator: graph.pagerank_fixed_point.",
)
def q_pagerank_user_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = G.pagerank_fixed_point(
        G.cooccurrence_edges(_events(spark, sf_dir)), d_pct=85, iters=5
    )
    return pr.select(
        F.col("id").alias("user_id"), "rank_nano", "rank"
    )


@register(
    "graph_bfs_levels",
    oracle=f"""
    WITH RECURSIVE edges AS ({_SQL_EDGES}),
    de AS (SELECT u AS src, v AS dst FROM edges
           UNION ALL SELECT v AS src, u AS dst FROM edges),
    seeds AS (SELECT DISTINCT user_id AS id FROM events
              WHERE user_id % 13 = 0),
    r AS (SELECT id, 0 AS level FROM seeds
          UNION
          SELECT de.dst AS id, r.level + 1 AS level
          FROM r JOIN de ON de.src = r.id
          WHERE r.level < 4)
    SELECT id AS user_id, CAST(min(level) AS INT) AS level
    FROM r GROUP BY id
    """,
    doc="Multi-source BFS levels (<= 4 hops) over the user "
        "co-occurrence graph from seed users (user_id % 13 = 0): the "
        "blast-radius / abuse-neighborhood primitive. Per round one "
        "frontier-edges shuffle join + one anti-join against the "
        "visited set, so round cost is O(frontier out-degree) not "
        "O(graph); hop cap bounds rounds and state; integer-exact, "
        "replayed by a recursive-CTE oracle. Operator: "
        "graph.bfs_levels.",
)
def q_graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    seeds = events.where(F.col("user_id") % 13 == 0).select("user_id")
    return G.bfs_levels(
        G.cooccurrence_edges(events), seeds, max_hops=4
    ).select(F.col("id").alias("user_id"), "level")
