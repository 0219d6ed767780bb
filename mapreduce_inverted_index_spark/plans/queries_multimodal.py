"""Multimodal query catalog: binary media columns + Pandas-UDF
feature extraction / frame sampling (SURVEY north-star extension).

``media_stats`` is metadata-only and oracle-checked; the Pandas-UDF
stages are rows-only for the driver (deterministic byte-level fakes,
value-pinned in tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    oracle=None,  # Pandas-UDF featurizer; value-pinned in tests.
    doc="Arrow-batched mapInPandas feature extraction over binary "
        "payloads (deterministic byte-moment stand-in for a model).",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.extract_features(_media(spark, sf_dir))


@register(
    "media_frame_samples",
    oracle=None,  # Pandas-UDF sampler; shape-pinned in tests.
    doc="Video frame sampling: every 4th 64-byte block per video "
        "payload via mapInPandas (one row per sampled frame).",
)
def q_media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.sample_frames(_media(spark, sf_dir))


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
