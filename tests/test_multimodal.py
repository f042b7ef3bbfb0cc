"""X5 multimodal plumbing: octet-semantics parity between the Spark
operators and the DuckDB oracle recipe, on exactly the payloads the driver
fixtures never exercise — empty documents and non-ASCII text whose UTF-8
encoding is longer than its character count (ADVICE r1: the old oracles
used CHARACTER semantics and only passed because the corpus was ASCII).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.multimodal import (
    as_blob_table,
    blob_metadata,
    extract_features,
    frame_sample,
)

# 'é' is 2 UTF-8 bytes, '€' is 3; doc 4 is empty; doc 5 spans >1 frame with
# a multi-byte char straddling the 64-byte frame boundary (63 ASCII chars
# then '€' puts bytes 64-66 across frames 0/1).
DOCS = [
    (1, "plain ascii text"),
    (2, "héllo wörld"),
    (3, "€uro sign first"),
    (4, ""),
    (5, "a" * 63 + "€" + "b" * 40),
]


@pytest.fixture(scope="module")
def blobs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return as_blob_table(
        df.withColumn("payload", F.encode("text", "UTF-8")),
        "payload",
        "text",
        "application/x-fake",
        "doc_id",
    )


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") v(doc_id, text)"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_blob_metadata_counts_octets_not_chars(spark, blobs):
    rows = {r["blob_id"]: r for r in blob_metadata(blobs).collect()}
    assert rows[1]["n_bytes"] == 16
    assert rows[2]["n_bytes"] == 13  # 11 chars, 2 of them 2-byte
    assert rows[3]["n_bytes"] == 17  # 15 chars, euro = 3 bytes
    assert rows[4]["n_bytes"] == 0
    assert rows[5]["n_bytes"] == 63 + 3 + 40


def test_feature_extract_octet_parity_with_oracle(spark, blobs):
    feats = extract_features(blobs).select(
        "blob_id",
        F.element_at("features", 1).alias("f_len"),
        F.element_at("features", 2).alias("f_first"),
        F.element_at("features", 3).alias("f_last"),
    )
    got = sorted(tuple(r) for r in feats.collect())
    want = _oracle(
        """
        SELECT doc_id,
               octet_length(encode(text))::DOUBLE,
               CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
                    ELSE (('0x' || substr(hex(encode(text)), 1, 2))::BIGINT)::DOUBLE
               END,
               CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
                    ELSE (('0x' || substr(hex(encode(text)),
                           octet_length(encode(text)) * 2 - 1, 2))::BIGINT)::DOUBLE
               END
        FROM documents
        """
    )
    assert got == want
    by_id = dict((r[0], r) for r in got)
    # '€' = 0xE2 0x82 0xAC: first BYTE of doc 3 is 0xE2 = 226 (ascii() of the
    # first CHARACTER would have been the codepoint 8364 — the old bug).
    assert by_id[3][2] == 226.0
    assert by_id[4] == (4, 0.0, 0.0, 0.0)


def test_frame_sample_octet_parity_with_oracle(spark, blobs):
    frames = frame_sample(blobs, every_n_bytes=64).select(
        "blob_id",
        "frame_no",
        F.length("frame").cast("long").alias("frame_len"),
        F.hex("frame").alias("frame_hex"),
    )
    got = sorted(tuple(r) for r in frames.collect())
    want = _oracle(
        """
        SELECT doc_id, i::INT,
               (length(substr(hex(encode(text)), i * 128 + 1, 128)) // 2)::BIGINT,
               substr(hex(encode(text)), i * 128 + 1, 128)
        FROM (SELECT doc_id, text FROM documents),
             LATERAL unnest(range(0, (octet_length(encode(text)) + 63) // 64)) AS t(i)
        """
    )
    assert got == want
    # Empty payload -> zero frames (the old impl emitted one empty frame).
    assert not [r for r in got if r[0] == 4]
    # Doc 5: 106 bytes -> 2 frames; the euro's 3 bytes split 1/2 across the
    # frame boundary, so frame 0 ends mid-codepoint — octet slicing exactly.
    d5 = [r for r in got if r[0] == 5]
    assert [r[1] for r in d5] == [0, 1]
    assert d5[0][2] == 64 and d5[1][2] == 42
    assert d5[0][3].endswith("E2") and d5[1][3].startswith("82AC")


def test_blob_metadata_scan_prunes_payload(spark, blobs, tmp_path):
    """The X5 storage claim, plan-asserted: a metadata-only projection over
    a STORED blob table must not read the binary payload column at all —
    column pruning reaches the parquet scan, so a 100 TB payload corpus
    costs nothing to catalog."""
    path = str(tmp_path / "blobs_parquet")
    blobs.write.mode("overwrite").parquet(path)
    md = blob_metadata(spark.read.parquet(path))
    plan = md._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "payload" not in read_schema
    assert "content_md5" in read_schema


def test_resize_payload_shapes(spark):
    """Nearest-neighbor resize: fixed output width for any input size
    (down- and up-sampling), empty payload -> empty output."""
    from bigdatapipeline_steamreviews_spark.operators.multimodal import (
        as_blob_table,
        resize_payload,
    )
    from pyspark.sql import functions as F

    rows = [
        (0, b"0123456789abcdefghij"),  # 20 bytes -> downsample
        (1, b"xy"),                    # 2 bytes  -> upsample
        (2, b""),                      # empty    -> empty
    ]
    df = spark.createDataFrame(rows, "blob_id long, payload binary").withColumn(
        "text", F.lit("")
    )
    blobs = as_blob_table(df, "payload", "text", "application/x-fake", "blob_id")
    got = {r.blob_id: r for r in resize_payload(blobs, target_bytes=4).collect()}
    # idx_i = i * n // 4
    assert bytes(got[0].resized) == bytes(b"0123456789abcdefghij"[i * 20 // 4] for i in range(4))
    assert bytes(got[1].resized) == bytes(b"xy"[i * 2 // 4] for i in range(4))  # upsample repeats
    assert got[1].orig_bytes == 2
    assert bytes(got[2].resized) == b"" and got[2].orig_bytes == 0
