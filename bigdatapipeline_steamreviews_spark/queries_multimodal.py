"""Registered queries for the multimodal column conventions (X5).

The binary payloads are synthesized from ``documents.text`` (no media files
exist in the test environment) — which makes the whole Python/Arrow path
oracle-checkable: DuckDB recomputes the same metadata/features/frames from
the text directly, so a mismatch anywhere in the Arrow round-trip fails the
gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.multimodal import (
    as_blob_table,
    blob_metadata,
    extract_features,
    frame_sample,
    resize_payload,
)
from .registry import register
from .sources.tables import load_table

_FAKE_MIME = "application/x-fake"


def _doc_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.withColumn("payload", F.encode(F.col("text"), "UTF-8"))
    return as_blob_table(with_payload, "payload", "text", _FAKE_MIME, "doc_id")


@register(
    "x5_blob_metadata",
    f"""
SELECT doc_id AS blob_id, 'text' AS modality, '{_FAKE_MIME}' AS mime,
       octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS content_md5
FROM documents
""",
    ("X5",),
    "Multimodal convention: opaque binary payload + typed metadata "
    "(modality, mime, byte length, digest); this projection never reads "
    "payload bytes (column pruning).",
)
def x5_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blob_metadata(_doc_blobs(spark, sf_dir))


@register(
    "x5_feature_extract",
    """
SELECT doc_id AS blob_id,
       octet_length(encode(text))::DOUBLE AS f_len,
       CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
            ELSE (('0x' || substr(hex(encode(text)), 1, 2))::BIGINT)::DOUBLE
       END AS f_first,
       CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
            ELSE (('0x' || substr(hex(encode(text)),
                   octet_length(encode(text)) * 2 - 1, 2))::BIGINT)::DOUBLE
       END AS f_last
FROM documents
""",
    ("X5",),
    "Arrow-batched mapInPandas feature extraction over payloads (the "
    "stubbed deterministic featurizer); checks the full Python round-trip "
    "against SQL recomputation. Both sides work on OCTETS (first/last byte "
    "of the UTF-8 payload, via hex-string slicing in the oracle), so "
    "non-ASCII and empty documents agree bit-for-bit.",
)
def x5_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_doc_blobs(spark, sf_dir))
    return feats.select(
        "blob_id",
        F.element_at("features", 1).alias("f_len"),
        F.element_at("features", 2).alias("f_first"),
        F.element_at("features", 3).alias("f_last"),
    )


@register(
    "x5_resize",
    """
SELECT doc_id AS blob_id,
       octet_length(encode(text))::BIGINT AS orig_bytes,
       CASE WHEN octet_length(encode(text)) = 0 THEN ''
            ELSE list_aggr(
              [substr(hex(encode(text)),
                      CAST(floor(i * octet_length(encode(text)) / 16.0)
                           AS INT) * 2 + 1, 2)
               for i in range(0, 16)],
              'string_agg', '')
       END AS resized_hex
FROM documents
""",
    ("X5",),
    "Resize plumbing through the codec seam: nearest-neighbor resample of "
    "every payload to a fixed 16 bytes (sample i reads source byte "
    "floor(i*n/16) — the same kernel arithmetic an image resize runs per "
    "axis), via Arrow-batched mapInPandas. The oracle re-derives each "
    "sampled OCTET by hex-string slicing, so the whole Python round-trip "
    "is bit-checked. operators/multimodal.py::resize_payload.",
)
def x5_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    resized = resize_payload(_doc_blobs(spark, sf_dir), target_bytes=16)
    return resized.select(
        "blob_id", "orig_bytes", F.hex("resized").alias("resized_hex")
    )


@register(
    "x5_frame_sample",
    """
SELECT doc_id AS blob_id, i::INT AS frame_no,
       (length(substr(hex(encode(text)), i * 128 + 1, 128)) // 2)::BIGINT
         AS frame_len,
       substr(hex(encode(text)), i * 128 + 1, 128) AS frame_hex
FROM (SELECT doc_id, text FROM documents),
     LATERAL unnest(range(0, (octet_length(encode(text)) + 63) // 64)) AS t(i)
""",
    ("X5",),
    "Frame-sampling plumbing: 1:N flatMap through mapInPandas (every 64-"
    "byte slice = one 'frame'); a real video codec yields frames the same "
    "way at a timestamp stride. Frames are OCTET slices on both sides "
    "(the oracle slices the hex string: 2 hex chars = 1 byte), so "
    "multi-byte UTF-8 sequences split mid-codepoint identically; a "
    "zero-byte payload yields zero frames on both sides.",
)
def x5_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frame_sample(_doc_blobs(spark, sf_dir), every_n_bytes=64)
    return frames.select(
        "blob_id",
        "frame_no",
        F.length("frame").cast("long").alias("frame_len"),
        F.hex("frame").alias("frame_hex"),
    )
