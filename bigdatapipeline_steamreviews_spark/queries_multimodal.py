"""Registered queries for the multimodal column conventions (X5).

The binary payloads are synthesized from ``documents.text`` (no media files
exist in the test environment) — which makes the whole Python/Arrow path
oracle-checkable: DuckDB recomputes the same metadata/features/frames from
the text directly, so a mismatch anywhere in the Arrow round-trip fails the
gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
WHERE text IS NOT NULL
""",
    ("X5",),
    "Arrow-batched mapInPandas feature extraction over payloads (the "
    "stubbed deterministic featurizer); checks the full Python round-trip "
    "— NULL payloads are QUARANTINED (skipped) on both sides "
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
WHERE text IS NOT NULL
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
FROM (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
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


@register(
    "x5_payload_dedup",
    """
SELECT md5(text) AS content_md5,
       min(doc_id) AS keep_id,
       count(*) AS n_copies,
       min(octet_length(encode(text)))::BIGINT AS n_bytes
FROM documents GROUP BY 1
""",
    ("X5", "X1"),
    "X1 over binary media: exact payload dedup on the convention's "
    "content_md5 METADATA column — one surviving (minimum) blob id per "
    "distinct payload digest, without ever decoding or re-reading payload "
    "bytes (on a persisted blob table the binary column is pruned from "
    "the scan entirely).  The shuffle key is the constant-width digest, "
    "exactly like text exact-dedup.",
)
def x5_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = blob_metadata(_doc_blobs(spark, sf_dir))
    return meta.groupBy("content_md5").agg(
        F.min("blob_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("n_bytes").alias("n_bytes"),
    )


@register(
    "x5_modality_budget",
    f"""
SELECT 'text' AS modality, '{_FAKE_MIME}' AS mime,
       count(*) AS n_blobs,
       sum(octet_length(encode(text)))::BIGINT AS total_bytes,
       max(octet_length(encode(text)))::BIGINT AS max_bytes
FROM documents
GROUP BY 1, 2
""",
    ("X5", "A*"),
    "Storage budgeting per (modality, mime) — the planning query a "
    "multimodal training pipeline runs before sampling a mix ('how many "
    "bytes of each modality do we hold'): metadata-only aggregation, "
    "payload column pruned from the scan, map-side partial aggregation.",
)
def x5_modality_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = blob_metadata(_doc_blobs(spark, sf_dir))
    return meta.groupBy("modality", "mime").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


# ---------------------------------------------------------------------------
# X5 — training-shard manifest (WebDataset-style fixed-byte packing)
# ---------------------------------------------------------------------------

_SHARD_BYTES = 32768


@register(
    "x5_shard_manifest",
    f"""
WITH sized AS (
  SELECT source, doc_id, octet_length(encode(text))::BIGINT AS n_bytes
  FROM documents
),
placed AS (
  SELECT source, doc_id, n_bytes,
         (sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes)
           // {_SHARD_BYTES} AS shard_id
  FROM sized
)
SELECT source, CAST(shard_id AS BIGINT) AS shard_id,
       count(*) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
       min(doc_id) AS first_doc_id,
       max(doc_id) AS last_doc_id
FROM placed
GROUP BY source, shard_id
ORDER BY source, shard_id
""",
    ("X5", "W*"),
    "Training-shard manifest: blobs are packed into ~32 KiB shards per "
    "source in deterministic doc_id order — a blob opens the shard its "
    "cumulative byte offset falls in (WebDataset/tar-shard layout; the "
    "manifest is what a 1000-GPU loader round-robins).  Pure metadata "
    "plan: byte sizes come from the typed n_bytes column, payload bytes "
    "are never read (column pruning), and the only shuffle is the "
    "per-source running-sum window + the shard groupBy.  Integer byte "
    "arithmetic end to end.",
)
def x5_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source",
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias(
            "n_bytes"
        ),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = sized.withColumn(
        "shard_id",
        F.expr(f"(sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id"
               f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
               f" - n_bytes) DIV {_SHARD_BYTES}"),
    )
    return (
        placed.groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").cast("long").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .orderBy("source", "shard_id")
    )
