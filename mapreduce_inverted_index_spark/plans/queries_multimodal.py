"""Multimodal query catalog: binary media columns + Pandas-UDF
feature extraction / frame sampling (SURVEY north-star extension).

Every query is DuckDB value-checked, including the Pandas-UDF stages:
the byte-level featurizer computes its moments from exact integer
sums (see operators/multimodal.py), so a DuckDB twin unnesting the
payload's hex pairs reproduces the floats bit-for-bit; frame samples
are checked via md5 of the frame's hex (binary-safe cross-engine).
Values are additionally pinned in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_inverted_index_spark.operators import multimodal as M
from mapreduce_inverted_index_spark.plans.registry import register
from mapreduce_inverted_index_spark.sources.tables import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.as_media_table(load_table(spark, sf_dir, "documents"))


@register(
    "media_stats",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             ['image', 'audio', 'video', 'text'][CAST(doc_id % 4 AS INTEGER) + 1] AS kind,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
      FROM documents
    )
    SELECT kind,
           count(*) AS n_media,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           max(n_bytes) AS max_bytes
    FROM m GROUP BY kind
    """,
    doc="Per-kind byte stats from the media metadata struct — the "
        "payload column is never read (column pruning).",
)
def q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.media_stats(_media(spark, sf_dir))


@register(
    "media_features",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             ['image', 'audio', 'video', 'text'][CAST(doc_id % 4 AS INTEGER) + 1] AS kind,
             CAST(text AS BLOB) AS payload
      FROM documents
    ),
    b AS (
      SELECT media_id, kind,
             [CAST(concat('0x', substring(hex(payload), 2*i - 1, 2)) AS BIGINT)
              for i in range(1, CAST(octet_length(payload) AS INTEGER) + 1)] AS bs
      FROM m
    ),
    s AS (
      SELECT media_id, kind,
             len(bs) AS n,
             list_sum(bs) AS s,
             list_sum(list_transform(bs, x -> x * x)) AS ss,
             list_min(bs) AS mn,
             list_max(bs) AS mx,
             list_aggregate(bs, 'median') AS med,
             len(list_filter(bs, x -> x > 96)) AS gt,
             bs[1] AS first
      FROM b
    )
    SELECT media_id, kind,
           round(CAST(coalesce(n, 0) AS DOUBLE), 6) AS f_len,
           round(coalesce(CAST(s AS DOUBLE) / n, 0.0), 6) AS f_mean,
           round(coalesce(sqrt((n * ss - s * s) / CAST(n * n AS DOUBLE)), 0.0), 6)
             AS f_std,
           round(coalesce(CAST(mn AS DOUBLE), 0.0), 6) AS f_min,
           round(coalesce(CAST(mx AS DOUBLE), 0.0), 6) AS f_max,
           round(coalesce(CAST(med AS DOUBLE), 0.0), 6) AS f_median,
           round(coalesce(CAST(gt AS DOUBLE) / n, 0.0), 6) AS f_gt96,
           round(coalesce(CAST(first AS DOUBLE), 0.0), 6) AS f_first
    FROM s
    """,
    doc="Arrow-batched mapInPandas feature extraction over binary "
        "payloads (deterministic byte-moment stand-in for a model). "
        "Moments come from exact integer sums, so the DuckDB twin "
        "unnesting hex pairs matches bit-for-bit. The catalog query "
        "unpacks the feature vector into scalar columns so the "
        "driver's row-sort canonicalization (which cannot order "
        "array cells) applies; the array form stays the operator API.",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = M.extract_features(_media(spark, sf_dir))
    names = ["f_len", "f_mean", "f_std", "f_min", "f_max",
             "f_median", "f_gt96", "f_first"]
    return feats.select(
        "media_id",
        "kind",
        *[F.col("features")[i].alias(n) for i, n in enumerate(names)],
    )


@register(
    "media_frame_samples",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, CAST(text AS BLOB) AS payload
      FROM documents WHERE doc_id % 4 = 2
    ),
    f AS (
      SELECT media_id, hex(payload) AS h,
             unnest(range(0, CAST(ceil(octet_length(payload) / 64.0) AS BIGINT), 4)) AS bi
      FROM m
    )
    SELECT media_id,
           CAST(bi // 4 AS BIGINT) AS frame_no,
           md5(lower(substring(h, CAST(bi * 128 + 1 AS INTEGER), 128))) AS frame_md5,
           CAST(length(substring(h, CAST(bi * 128 + 1 AS INTEGER), 128)) // 2 AS BIGINT)
             AS frame_bytes
    FROM f
    """,
    doc="Video frame sampling: every 4th 64-byte block per video "
        "payload via mapInPandas (one row per sampled frame), "
        "reported as (frame_md5, frame_bytes) — md5 over the frame's "
        "lowercased hex keeps the binary check engine-neutral.",
)
def q_media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = M.sample_frames(_media(spark, sf_dir))
    return frames.select(
        "media_id",
        "frame_no",
        F.md5(F.lower(F.hex("frame"))).alias("frame_md5"),
        F.octet_length("frame").cast("long").alias("frame_bytes"),
    )


@register(
    "media_exact_dedup",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(text AS BLOB) AS payload,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
      FROM documents
    )
    SELECT md5(lower(hex(payload))) AS content_hash,
           min(media_id) AS media_id,
           count(*) AS n_copies,
           CAST((count(*) - 1) * max(n_bytes) AS BIGINT) AS bytes_reclaimable
    FROM m GROUP BY 1
    """,
    doc="Exact dedup over binary media payloads: hash-groupBy carries "
        "(hash, id, n_bytes) only — payload bytes never shuffle; "
        "hex-normalized md5 keeps the check cross-engine.",
)
def q_media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.media_exact_dedup(_media(spark, sf_dir))


@register(
    "media_phash_near_dup",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             lower(hex(CAST(text AS BLOB))) AS hx,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
      FROM documents
      WHERE octet_length(CAST(text AS BLOB)) > 0),
    b AS (
      SELECT media_id, n,
             list_transform(range(1, n + 1), i ->
               (instr('0123456789abcdef', substr(hx, CAST(2*i-1 AS INTEGER), 1)) - 1) * 16
               + instr('0123456789abcdef', substr(hx, CAST(2*i AS INTEGER), 1)) - 1) AS bytes
      FROM m),
    s AS (SELECT media_id, n, bytes, list_sum(bytes) AS total FROM b),
    sig AS (
      SELECT media_id,
             list_sum(list_transform(range(0, 32), blk ->
               CASE WHEN ((blk+1)*n)//32 - (blk*n)//32 > 0
                     AND list_sum(list_slice(bytes, (blk*n)//32 + 1,
                                             ((blk+1)*n)//32)) * n
                         >= total * (((blk+1)*n)//32 - (blk*n)//32)
               THEN CAST(1 AS BIGINT) << CAST(blk AS INTEGER)
               ELSE CAST(0 AS BIGINT) END)) AS phash
      FROM s)
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 3
    """,
    doc="Perceptual-hash media near-dup: byte-level aHash (32 spans, "
        "span mean vs global mean, cross-multiplied integer compare) "
        "over binary payloads, then the SAME pigeonhole banding as "
        "the text SimHash tier — 4 bands of 8 bits, equi-join on "
        "(band, key), bit_count verify on candidates only. The "
        "oracle is the all-pairs brute force, so a green row proves "
        "the banding's exact recall within k on this family too. A "
        "real image pipeline computes identical bits over decoded "
        "8x8 luma (decode_image is the honest stub); everything "
        "downstream of decode is exercised for real here.",
)
def q_media_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.media_phash_near_dup(_media(spark, sf_dir), max_hamming=3)


@register(
    "media_resize_pixels",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             ['image', 'audio', 'video', 'text'][CAST(doc_id % 4 AS INTEGER) + 1] AS kind,
             lower(hex(CAST(text AS BLOB))) AS hx,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
      FROM documents),
    b AS (
      SELECT media_id, kind, n,
             list_transform(range(1, n + 1), i ->
               (instr('0123456789abcdef', substr(hx, CAST(2*i-1 AS INTEGER), 1)) - 1) * 16
               + instr('0123456789abcdef', substr(hx, CAST(2*i AS INTEGER), 1)) - 1) AS bytes
      FROM m),
    p AS (
      SELECT media_id, kind,
             list_transform(range(0, 16), i ->
               CASE WHEN ((i+1)*n)//16 - (i*n)//16 > 0
               THEN CAST(list_sum(list_slice(bytes, (i*n)//16 + 1, ((i+1)*n)//16))
                         // (((i+1)*n)//16 - (i*n)//16) AS DOUBLE)
               ELSE 0.0 END) AS pixels
      FROM b)
    SELECT media_id, kind,
           pixels[1] AS p00, pixels[2] AS p01, pixels[3] AS p02,
           pixels[4] AS p03, pixels[5] AS p04, pixels[6] AS p05,
           pixels[7] AS p06, pixels[8] AS p07, pixels[9] AS p08,
           pixels[10] AS p09, pixels[11] AS p10, pixels[12] AS p11,
           pixels[13] AS p12, pixels[14] AS p13, pixels[15] AS p14,
           pixels[16] AS p15
    FROM p
    """,
    doc="Byte-level resize/downsample via mapInPandas (Arrow-batched "
        "narrow map, payloads never shuffle): 16 output 'pixels' = "
        "per-span mean byte values on the same integer grid as the "
        "perceptual hash — exact floor math, replayed by the DuckDB "
        "twin from the hex rendering. The real image path swaps the "
        "inner loop for decode+PIL resize; plan shape unchanged. "
        "The catalog twin unpacks the 16-element pixel array into "
        "scalar p00..p15 columns because the driver's row "
        "canonicalizer cannot hash ARRAY cells (same treatment as "
        "media_features r5); the array form stays the operator API. "
        "Operator: multimodal.resize_payloads.",
)
def q_media_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    resized = M.resize_payloads(_media(spark, sf_dir), out_len=16)
    return resized.select(
        "media_id",
        "kind",
        *[F.col("pixels")[i].alias(f"p{i:02d}") for i in range(16)],
    )
