"""X5 — multimodal column conventions + Pandas-UDF processing plumbing
(SURVEY.md §2.8).

Convention: a modality column is an opaque ``binary`` payload plus typed
metadata columns (mime, modality, byte length, content digest) — parquet
keeps binary columnar and the metadata prunable, so a scan that only needs
metadata never touches payload bytes (column pruning does the work at
100 TB).

Processing (decode / feature-extract / resize / frame-sample) runs as
Arrow-batched ``mapInPandas`` — the ONLY place this engine leaves the JVM,
because no Catalyst builtin decodes media.  The image/audio libraries are
not installed in this environment, so the actual codec call is stubbed
behind ``_decode_payload`` (NotImplementedError for real codecs, a
deterministic fake for tests); everything Spark-architectural — schema
contract, Arrow batch iteration, partition-parallel execution, output
shape — is real and tested.

Scale notes:
* payloads ride along shuffles only if selected — keep transformations
  metadata-first, join payloads back by id late;
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds per-batch memory
  when payloads are large (set well below default for video frames).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MODALITY_METADATA_COLUMNS",
    "as_blob_table",
    "blob_metadata",
    "extract_features",
    "frame_sample",
    "resize_payload",
]

MODALITY_METADATA_COLUMNS = ("modality", "mime", "n_bytes", "content_md5")


def as_blob_table(
    df: DataFrame, payload_col: str, modality: str, mime: str, id_col: str
) -> DataFrame:
    """Wrap a binary column into the multimodal convention: payload +
    typed metadata, digest included so dedup works without payload reads."""
    payload = F.col(payload_col)
    return df.select(
        F.col(id_col).alias("blob_id"),
        payload.alias("payload"),
        F.lit(modality).alias("modality"),
        F.lit(mime).alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def blob_metadata(blobs: DataFrame) -> DataFrame:
    """Metadata-only projection — never touches payload bytes (column
    pruning removes the binary column from the scan entirely)."""
    return blobs.select("blob_id", *MODALITY_METADATA_COLUMNS)


def _decode_payload(payload: bytes, mime: str):
    """The codec seam.  Real deployments dispatch on mime to an installed
    decoder (PIL / libav / soundfile); none exist in this container, so
    only the deterministic test fake is implemented.

    A NULL payload or NULL mime decodes to ``None`` — there is nothing to
    hand a codec — and the decode-backed operators QUARANTINE such rows
    (skip, never crash the job): one malformed blob in a 100 TB batch
    must not fail the stage.  An *unknown but present* mime still raises:
    that is a missing-codec deployment error, not bad data.
    """
    if payload is None or mime is None:
        return None
    if mime == "application/x-fake":
        return payload  # tests: payload IS the decoded content
    raise NotImplementedError(
        f"no decoder for {mime!r}: media codecs are not installed; "
        "register one at operators.multimodal._decode_payload"
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(blobs: DataFrame, arrow_batch_size: int = 256) -> DataFrame:
    """Feature extraction over payloads as Arrow-batched mapInPandas.

    The fake featurizer emits [n_bytes, first_byte, last_byte] per blob —
    deterministic, so the full Python path (Arrow transfer in, pandas
    batch, Arrow transfer out) is oracle-checkable end-to-end.  A real
    model would produce an embedding the same shape/way.
    """
    spark = blobs.sparkSession
    from ..session import set_unless_pinned

    set_unless_pinned(
        spark, "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_size)
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (bid, _decode_payload(p, m))
                for bid, p, m in zip(pdf["blob_id"], pdf["payload"], pdf["mime"])
            ]
            rows = [(bid, d) for bid, d in rows if d is not None]  # quarantine
            yield pd.DataFrame(
                {
                    "blob_id": [bid for bid, _ in rows],
                    "features": [
                        [float(len(d)), float(d[0]), float(d[-1])] if len(d) else [0.0, 0.0, 0.0]
                        for _, d in rows
                    ],
                }
            )

    return blobs.select("blob_id", "payload", "mime").mapInPandas(
        featurize, schema=_FEATURE_SCHEMA
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("orig_bytes", T.LongType(), False),
        T.StructField("resized", T.BinaryType(), False),
    ]
)


def resize_payload(blobs: DataFrame, target_bytes: int = 16) -> DataFrame:
    """Resize plumbing: every payload is nearest-neighbor resampled to a
    fixed ``target_bytes`` length through the codec seam — the 1-D stand-in
    for image resize / audio resample (sample index i reads source byte
    ``floor(i * n / target)``, the same arithmetic a nearest-neighbor
    image kernel runs per axis).  Down- and up-sampling both work; a
    zero-byte payload resizes to zero bytes.  Output rows are fixed-width
    regardless of input size — which is the point at 100 TB: downstream
    stages (feature models, dedup over thumbnails) see bounded bytes per
    row no matter what arrived.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_orig, out_resized = [], [], []
            for bid, payload, mime in zip(pdf["blob_id"], pdf["payload"], pdf["mime"]):
                content = _decode_payload(payload, mime)
                if content is None:  # quarantine undecodable blobs
                    continue
                n = len(content)
                resized = (
                    bytes(content[i * n // target_bytes] for i in range(target_bytes))
                    if n
                    else b""
                )
                out_ids.append(bid)
                out_orig.append(n)
                out_resized.append(resized)
            yield pd.DataFrame(
                {"blob_id": out_ids, "orig_bytes": out_orig, "resized": out_resized}
            )

    return blobs.select("blob_id", "payload", "mime").mapInPandas(
        resize, schema=_RESIZE_SCHEMA
    )


def frame_sample(blobs: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame (a 1:N
    flatMap through mapInPandas).  The fake "codec" treats every
    ``every_n_bytes`` slice as a frame; a real video decoder yields actual
    frames at a timestamp stride the same way."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_frames = [], [], []
            for bid, payload, mime in zip(pdf["blob_id"], pdf["payload"], pdf["mime"]):
                content = _decode_payload(payload, mime)
                if content is None:  # quarantine undecodable blobs
                    continue
                # Zero-length content yields zero frames (a 0-byte video has
                # no frames to sample), matching ceil(n/stride) everywhere.
                for i in range(0, len(content), every_n_bytes):
                    out_ids.append(bid)
                    out_nos.append(i // every_n_bytes)
                    out_frames.append(bytes(content[i : i + every_n_bytes]))
            yield pd.DataFrame(
                {"blob_id": out_ids, "frame_no": out_nos, "frame": out_frames}
            )

    return blobs.select("blob_id", "payload", "mime").mapInPandas(
        sample, schema=_FRAME_SCHEMA
    )
