"""Multimodal column plumbing: image/audio/video as opaque BINARY
payloads with typed metadata, processed by Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the *decode* step is
stubbed (clearly marked, import-gated); everything Spark-side — the
media schema, binary payload handling, ``mapInPandas`` batch shape,
partitioning — is real and tested. Swapping the stub for PIL/ffmpeg
changes one function body, not the plan.

Scale notes: payloads stay in executor memory as Arrow binary
columns; feature extraction is a narrow map stage (no shuffle); the
metadata struct supports partition pruning by kind/mime without
touching payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "as_media_table",
    "media_stats",
    "extract_features",
    "sample_frames",
    "decode_image",
    "media_exact_dedup",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video | text
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("source", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """STUB: real image decode requires PIL/opencv, not present in
    this container. The Spark-side plumbing (binary column → Pandas
    UDF batch) is what the engine provides; swap this body for
    ``PIL.Image.open(io.BytesIO(payload))`` in production."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs PIL; payload plumbing is tested with "
            "deterministic byte-level features instead"
        ) from e
    raise NotImplementedError("unreachable in this container")


def as_media_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table derived from ``documents``: payload =
    utf-8 bytes of the text, kind cycles image/audio/video/text.
    Stands in for a real multimodal corpus with byte-true payloads."""
    kind = F.element_at(
        F.lit(["image", "audio", "video", "text"]),
        (F.col(id_col) % 4 + 1).cast("int"),
    )
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind byte stats straight off the metadata struct — never
    touches payload bytes (column pruning keeps the scan narrow)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``
    (Arrow-batched; one Python round-trip per batch, not per row).

    The featurizer is a deterministic byte-level stand-in (moments of
    the byte distribution) so tests pin exact values; a real model
    swaps the inner function only.

    Cross-engine checkability: every moment is computed from EXACT
    integer sums (n, Σx, Σx² as Python ints), so the float results
    are bit-identical to a DuckDB twin evaluating the same formulas —
    e.g. std = sqrt((n·Σx² − (Σx)²) / n²) has an integer numerator
    and IEEE sqrt is correctly rounded. Rounding happens Spark-side
    (``F.round`` matches DuckDB ``round``; Python's ``round`` does
    not, its half-even decimal rounding diverges in edge cases).
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                n = int(arr.size)
                if n == 0:
                    feats.append([0.0] * dim)
                    continue
                s = int(arr.sum(dtype=np.int64))
                ss = int((arr.astype(np.int64) ** 2).sum())
                base = [
                    float(n),
                    s / n,
                    math.sqrt((n * ss - s * s) / (n * n)),
                    float(int(arr.min())),
                    float(int(arr.max())),
                    float(np.median(arr)),  # .0 or .5 exactly — no float noise
                    int((arr > 96).sum()) / n,
                    float(int(arr[0])),
                ]
                feats.append(base[:dim])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    out = media.mapInPandas(featurize, schema=_FEATURES_SCHEMA)
    return out.select(
        "media_id",
        "kind",
        F.transform("features", lambda x: F.round(x, 6)).alias("features"),
    )


def sample_frames(media: DataFrame, frame_bytes: int = 64, stride: int = 4) -> DataFrame:
    """Frame sampling for video payloads: every ``stride``-th
    ``frame_bytes`` block, as a Pandas UDF over binary columns (the
    real version decodes containers; the batch/partition shape is
    identical). One output row per sampled frame."""

    def sampler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                blocks = [
                    payload[i : i + frame_bytes]
                    for i in range(0, len(payload), frame_bytes)
                ]
                for no, blk in enumerate(blocks[::stride]):
                    ids.append(mid)
                    nos.append(no)
                    frames.append(blk)
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    video = media.where(F.col("kind") == "video")
    return video.mapInPandas(sampler, schema=_FRAMES_SCHEMA)


def media_exact_dedup(media: DataFrame) -> DataFrame:
    """Exact duplicate groups over BINARY payloads: one row per
    distinct payload hash with the keeper (min media_id), copy count,
    and reclaimable bytes. Same scale shape as text exact-dedup: the
    shuffle carries (hash, id, n_bytes) — payload bytes never move.

    The hash is ``md5(lower(hex(payload)))`` rather than md5 of the
    raw bytes: DuckDB's md5 only takes VARCHAR, so hashing the
    case-normalized hex rendering keeps the operator value-checkable
    cross-engine at the cost of one codegen'd hex pass.
    """
    return (
        media.select(
            F.md5(F.lower(F.hex("payload"))).alias("content_hash"),
            "media_id",
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("media_id").alias("media_id"),
            F.count("*").alias("n_copies"),
            ((F.count("*") - 1) * F.max("n_bytes")).alias("bytes_reclaimable"),
        )
    )
