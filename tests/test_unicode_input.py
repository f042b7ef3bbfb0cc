"""Multibyte-text regression (round-8 audit, DIRTYDATA.md §4): the
driver's synthetic corpus is pure ASCII, so the text family's behavior
on real-world text — 2-byte Latin, 3-byte CJK, 4-byte astral-plane emoji
(a UTF-16 SURROGATE PAIR on the JVM) — was unverified until the unicode
corpus.  The full 217-query differential sweep passed first-try; this
pins the queries with the sharpest exposure so a regression (e.g. a
switch from codepoint-aware to code-unit string ops) fails loudly:

* ``x4_token_stats`` — regex piece counts: Java ``Pattern`` matches per
  CODE POINT (so ``🎮`` is one ``[^a-zA-Z0-9 ]`` piece, not two
  surrogate halves), agreeing with DuckDB's RE2; ``length()`` counts
  codepoints in both engines.
* ``x4_fingerprint`` / ``x2_simhash`` — md5 over UTF-8 BYTES, identical
  by construction; any normalization sneaking in would diverge.
* ``j4_fuzzy_name_match`` — deletion variants built per character over
  multibyte customer names.
* ``x4_pii_scrub`` — regex rewrite adjacent to multibyte text.
* ``src_text_lines`` — the bijective line-escape round-trip must not
  mangle multibyte bytes.
* ``src_binaryfile_manifest`` — byte lengths (``octet_length``/UTF-8
  encode) vs character lengths kept straight.
"""

from __future__ import annotations

import os
import pathlib
import sys

import duckdb
import pytest

from bigdatapipeline_steamreviews_spark import REGISTRY, queries
from bigdatapipeline_steamreviews_spark.sources.tables import TABLE_NAMES
from tests.conftest import SF_DIR

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

from adversarial_data import CORPUS_VERSION, _unicodify, write_flat  # noqa: E402
from verify_local import compare  # noqa: E402

UNI_DIR = f"/tmp/spark_graft_sf_unicode_test_{CORPUS_VERSION}"

PINNED = [
    "x4_token_stats",
    "x4_fingerprint",
    "x2_simhash",
    "j4_fuzzy_name_match",
    "x4_pii_scrub",
    "src_text_lines",
    "src_binaryfile_manifest",
]


@pytest.fixture(scope="module")
def uni_dir(spark):
    if not os.path.exists(os.path.join(UNI_DIR, "_DONE")):
        for t in TABLE_NAMES:
            df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
            write_flat(_unicodify(df, t), UNI_DIR, t)
        open(os.path.join(UNI_DIR, "_DONE"), "w").close()
    return UNI_DIR


@pytest.fixture(scope="module")
def duck(uni_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{uni_dir}/{t}.parquet'")
    return con


def test_corpus_actually_contains_astral_plane_text(spark, uni_dir):
    """Guard the fixture: without a 4-byte (surrogate-pair) character in
    the corpus the whole module is vacuous."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{uni_dir}/documents.parquet")
    n = docs.filter(F.col("text").contains("\U0001f3ae")).count()
    assert n > 0
    n3 = docs.filter(F.col("text").contains("中")).count()
    assert n3 > 0


@pytest.mark.parametrize("name", PINNED)
def test_pinned_queries_match_oracle_on_unicode_text(spark, uni_dir, duck, name):
    queries()
    spec = REGISTRY[name]
    sdf = spec.fn(spark, uni_dir).toPandas()
    spark.catalog.clearCache()
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert problems == [], problems


def test_codepoint_not_code_unit_semantics(spark):
    """The sharpest edge, asserted directly: one astral-plane emoji is ONE
    character to length() and ONE regex char-class match — never two
    surrogate halves — and four UTF-8 bytes to octet_length()."""
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(
            F.length(F.lit("a\U0001f3aeb")).alias("n_chars"),
            F.octet_length(F.lit("\U0001f3ae")).alias("n_bytes"),
            F.size(
                F.regexp_extract_all(
                    F.lit("a\U0001f3aeb"), F.lit("[^a-zA-Z0-9 ]"), 0
                )
            ).alias("n_pieces"),
        )
        .collect()[0]
    )
    assert (row.n_chars, row.n_bytes, row.n_pieces) == (3, 4, 1)
    duck_row = duckdb.connect().execute(
        "SELECT length('a\U0001f3aeb'), octet_length(encode('\U0001f3ae')), "
        "len(regexp_extract_all('a\U0001f3aeb', '[^a-zA-Z0-9 ]'))"
    ).fetchone()
    assert tuple(duck_row) == (3, 4, 1)
