"""Source-format coverage beyond parquet/CSV (SURVEY.md §2.1): the flagship
aggregate run end-to-end from JSON-lines and ORC stagings of the events
table, gated against the SAME DuckDB oracle as the parquet flagship — if
the format round-trip loses or mangles a single value anywhere (timestamp
precision, embedded-JSON escaping, null handling), the hash compare fails.

Staging derives deterministically from the driver's parquet (fingerprint-
cached under /tmp, same invalidation discipline as the streaming replay
stage), so the oracle legitimately reads the parquet view: identical rows,
different wire format on the Spark side.

Scale notes: both readers take a DECLARED schema (no sampling-based
inference pass over 100 TB); JSON carries event-time as epoch-micros
integers because timestamp-string round-trips are where JSON pipelines
silently lose sub-second precision.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.aggregations import daily_summary
from .queries_streaming import _source_fingerprint
from .registry import FLAGSHIP_ORACLE, _sum_exact_sql, register
from .sources.tables import load_table

_EVENTS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # epoch micros
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _stage_events_as(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write the events table once as ``fmt`` under /tmp, fingerprint-keyed
    so regenerated testdata can never serve a stale staging."""
    from .sources.staging import SRC_STAGE_ROOT, SRC_STAGE_VERSION

    key = _source_fingerprint(sf_dir)
    # Layout-versioned (SRC_STAGE_VERSION, bumped when the staged
    # encoding changes — v2: ORC ts switched from TIMESTAMP to epoch
    # micros, DIRTYDATA.md §9; without the suffix a stale pre-fix stage
    # would keep serving the TZ-fragile layout) and rooted under
    # SRC_STAGE_ROOT so prune_all_stages evicts dead generations.
    os.makedirs(SRC_STAGE_ROOT, exist_ok=True)
    out = os.path.join(
        SRC_STAGE_ROOT, f"{fmt}_{key}_{SRC_STAGE_VERSION}"
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        df = load_table(spark, sf_dir, "events")
        if fmt == "json":
            df = df.withColumn("ts", F.unix_micros(F.col("ts")))
            df.write.mode("overwrite").json(out)
        elif fmt == "orc":
            # Instants travel as epoch-micros integers, NOT as ORC
            # TIMESTAMP: ORC's TIMESTAMP has LOCAL-TIME semantics — the
            # Java reader reconstructs the stored wall-clock in the
            # reader JVM's DEFAULT timezone, so a file written by a UTC
            # fleet and read by a +05:45 executor shifts every instant
            # by -5h45m (measured: the round-9 environment-perturbation
            # audit, DIRTYDATA.md §9; parquet is immune because it
            # stores UTC-adjusted int64).  Pinning user.timezone on the
            # driver would only mask it in local mode — the decode
            # happens on executors.  Same recipe as the JSON stager.
            df = df.withColumn("ts", F.unix_micros(F.col("ts")))
            df.write.mode("overwrite").orc(out)
        else:  # pragma: no cover - registration-time typo guard
            raise ValueError(f"unknown staging format {fmt!r}")
    return out


@register(
    "src_json_daily_summary",
    FLAGSHIP_ORACLE,
    ("S1", "A1", "P2", "P3"),
    "The flagship daily summary computed from a JSON-lines source: events "
    "staged as JSON (event-time as epoch-micros integers, props as an "
    "embedded JSON string — the escaping round-trip is part of the test), "
    "read back with a DECLARED schema (no inference scan), aggregated, and "
    "hash-compared against the parquet oracle. Proves the engine's query "
    "surface is source-format-agnostic end-to-end.",
)
def src_json_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_events_as(spark, sf_dir, "json")
    events = (
        spark.read.schema(_EVENTS_JSON_SCHEMA)
        .json(path)
        .withColumn("ts", F.timestamp_micros(F.col("ts")))
    )
    return daily_summary(events)


@register(
    "src_orc_daily_summary",
    FLAGSHIP_ORACLE,
    ("S1", "A1"),
    "The flagship daily summary computed from an ORC source (the second "
    "columnar format a lakehouse actually encounters).  Instants travel "
    "as epoch-micros integers because ORC TIMESTAMP has local-time "
    "semantics — the reader JVM's default timezone shifts every value "
    "when it differs from the writer's (found by the round-9 "
    "environment-perturbation audit, DIRTYDATA.md §9; pinned by "
    "tests/test_env_invariance.py).  The result must hash-match the "
    "parquet oracle exactly.",
)
def src_orc_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_events_as(spark, sf_dir, "orc")
    events = spark.read.orc(path).withColumn(
        "ts", F.timestamp_micros(F.col("ts"))
    )
    return daily_summary(events)


@register(
    "src_union_evolved_schema",
    """
SELECT coalesce(lang, 'unknown') AS lang,
       count(*) AS n_docs,
       sum(len(string_split(text, ' ')))::BIGINT AS total_tokens
FROM (
  SELECT doc_id, text, lang FROM documents WHERE doc_id % 3 != 0
  UNION ALL
  SELECT doc_id, text, NULL AS lang FROM documents WHERE doc_id % 3 = 0
)
GROUP BY 1
""",
    ("S*", "P13"),
    "Schema evolution at the ingest edge: an older batch written before "
    "the `lang` column existed unions with current batches via "
    "unionByName(allowMissingColumns=True) — positional unionAll would "
    "silently misalign columns; by-name union NULL-fills the missing one "
    "and the aggregate treats it as 'unknown'.  The batch split is "
    "simulated by doc_id parity; the oracle mirrors it with explicit "
    "NULL projection.",
)
def src_union_evolved_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    current = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text", "lang")
    # The "pre-lang" batch: the column simply doesn't exist in its schema.
    legacy = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    unioned = current.unionByName(legacy, allowMissingColumns=True)
    return unioned.groupBy(
        F.coalesce(F.col("lang"), F.lit("unknown")).alias("lang")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        # Null-safe token count: size(split(NULL)) is -1 in Spark and
        # would DEDUCT from the total; SQL sum skips NULLs — match it
        # (the doc still counts in n_docs).
        F.sum(
            F.when(
                F.col("text").isNotNull(), F.size(F.split(F.col("text"), " "))
            )
        ).cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Partition-pruned directory source
# ---------------------------------------------------------------------------


@register(
    "src_partitioned_pruned_scan",
    f"""
SELECT date_trunc('day', ts) AS day, count(*) AS n_events,
       {_sum_exact_sql('value')} AS total_value
FROM events WHERE event_type = 'purchase'
GROUP BY 1
""",
    ("S*", "P7", "P9"),
    "Directory-partitioned source with partition pruning: the events "
    "table is staged once per corpus fingerprint as "
    "partitionBy(event_type) parquet, and the query's equality filter "
    "becomes a PartitionFilter — the scan lists ONLY the one "
    "event_type=purchase directory, never opening the other partitions' "
    "files (plan-asserted in tests/test_scale_layout.py for the layout "
    "op; here the pruned read is oracle-gated end-to-end against the "
    "unpartitioned table).  At 100 TB this is the difference between "
    "reading 1/N of the lake and reading all of it.",
)
def src_partitioned_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql import functions as F

    from .functions import sum_exact
    from .sources.staging import (
        STAGE_ROOT,
        STAGE_VERSION,
        publish_dir,
        source_fingerprint,
    )
    from .sources.tables import load_table

    fp = source_fingerprint(sf_dir, "events")
    path = os.path.join(STAGE_ROOT, f"events_bytype_{fp}_{STAGE_VERSION}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.build{os.getpid()}"
        load_table(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(tmp)
        publish_dir(tmp, path)
    # Explicit schema: an empty events table writes a partition dir with
    # no parquet footers to infer from, and a pruned scan of an empty
    # partition must return 0 rows, not UNABLE_TO_INFER_SCHEMA.
    purchases = (
        spark.read.schema(load_table(spark, sf_dir, "events").schema)
        .parquet(path)
        .filter(F.col("event_type") == "purchase")
    )
    return purchases.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_exact("value").alias("total_value"),
    )


@register(
    "src_skipping_index",
    f"""
WITH probe AS (SELECT max(user_id) AS u FROM events)
SELECT event_type, count(*)::BIGINT AS n_events,
       {_sum_exact_sql('value')} AS total_value
FROM events, probe
WHERE user_id = probe.u
GROUP BY event_type
ORDER BY event_type
""",
    ("S*", "P9", "P7"),
    "FILE-SKIPPING INDEX served as a queryable table (round-14 ask #5): "
    "the events table is staged once per corpus fingerprint as a "
    "range-CLUSTERED parquet directory (repartitionByRange(8, user_id) + "
    "sortWithinPartitions — each file covers a narrow user range), a "
    "per-file (min,max,count) stats TABLE is built in one distributed "
    "pass and PERSISTED (the same metadata parquet footers / Delta "
    "add-file stats / Iceberg manifests carry; materialized so planning "
    "never opens data files), and the point lookup consults the INDEX "
    "first: enumerate candidate files whose [min,max] can contain the "
    "probe key, read ONLY those, filter, aggregate.  The probe key is "
    "derived from the index itself (the global max user id = max of "
    "file maxes — no extra corpus scan, deterministic, SQL-expressible, "
    "and GUARANTEED to exist so the gate can never pass vacuously on "
    "0==0; a mid-range probe like max//2 lands in id GAPS on replicated "
    "corpora — caught by the round-14 30x probe's rows_ratio), and the "
    "oracle runs the FULL SCAN over the raw table, so the hash match "
    "proves pruning lost and invented nothing.  File elimination "
    "(candidates < total) "
    "is asserted in tests/test_scale_layout.py.  The per-file stats "
    "collect is one row PER FILE — planner-scale, not data-scale — "
    "exactly the decision a lakehouse planner makes from manifests.  "
    "sources/layout.py::file_stats_table/prune_files_for_point.",
)
def src_skipping_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql import functions as F

    from .functions import sum_exact
    from .sources.layout import file_stats_table, prune_files_for_point
    from .sources.staging import (
        STAGE_ROOT,
        STAGE_VERSION,
        _walk_identity,
        publish_dir,
        source_fingerprint,
        stage_params_key,
        staged_parquet,
    )
    from .sources.tables import load_table

    ev_schema = load_table(spark, sf_dir, "events").schema
    fp = source_fingerprint(sf_dir, "events")
    clustered = os.path.join(STAGE_ROOT, f"events_byuser_{fp}_{STAGE_VERSION}")
    if not os.path.exists(os.path.join(clustered, "_SUCCESS")):
        tmp = f"{clustered}.build{os.getpid()}"
        (
            load_table(spark, sf_dir, "events")
            .repartitionByRange(8, "user_id")
            .sortWithinPartitions("user_id")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        publish_dir(tmp, clustered)
    # The stats rows embed ABSOLUTE part-file paths of the clustered
    # stage, whose names carry write UUIDs — a stats stage keyed by the
    # source fingerprint alone would keep pointing at the OLD part files
    # if the clustered stage were ever deleted and rebuilt independently
    # (r14 ADVICE queries_sources.py:291).  Folding the clustered
    # directory's content identity into the stage name ties the manifest
    # to the exact file set it indexes: a rebuilt clustered stage mints a
    # new stats stage instead of serving stale paths.
    stats = staged_parquet(
        spark,
        f"skipidx_user_stats_{stage_params_key(_walk_identity(clustered))}",
        fp,
        lambda: file_stats_table(spark, clustered, ["user_id"]),
    ).collect()  # one row per FILE: the planner's manifest, not data

    def _empty() -> DataFrame:
        return (
            spark.createDataFrame([], ev_schema)
            .select("event_type")
            .withColumn("n_events", F.lit(0).cast("long"))
            .withColumn("total_value", F.lit(None).cast("double"))
        )

    maxes = [r["max_user_id"] for r in stats if r["max_user_id"] is not None]
    if not maxes:  # empty corpus (or all-NULL keys): oracle emits 0 rows
        return _empty()
    # the probe key comes FROM the index (max of file maxes == global
    # max): it exists by construction, so the gate cannot pass 0==0
    probe = max(maxes)
    cand = prune_files_for_point(stats, "user_id", probe)
    if not cand:  # unreachable for this probe; kept for arbitrary keys
        return _empty()
    pruned = (
        spark.read.schema(ev_schema)
        .parquet(*cand)
        .filter(F.col("user_id") == probe)
    )
    return (
        pruned.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_exact("value").alias("total_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# binaryFile source: blob-per-file ingest (the multimodal lake layout)
# ---------------------------------------------------------------------------


def _stage_doc_files(spark: SparkSession, sf_dir: str) -> str:
    """One file per document under /tmp, fingerprint-keyed.

    Test scaffolding only: a real multimodal lake already IS files-on-
    storage (images/audio dropped by upstream collectors); the measured
    operator is the ``binaryFile`` read below, not this writer.  The
    writer uses pyarrow directly (driver-side, 500 files at test scale)
    rather than a Spark job because Spark has no one-file-per-row sink —
    and should not: at scale the files pre-exist.
    """
    from .sources.staging import STAGE_ROOT, STAGE_VERSION, publish_dir, source_fingerprint

    fp = source_fingerprint(sf_dir, "documents")
    out = os.path.join(STAGE_ROOT, f"doc_files_{fp}_{STAGE_VERSION}")
    if not os.path.exists(os.path.join(out, "_DONE")):
        import pyarrow.parquet as pq

        tmp = f"{out}.build{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
            if not text:
                # No payload (NULL or empty) -> no file (the x5
                # quarantine convention).
                # NB Spark's binaryFile source silently DROPS zero-byte
                # files (observed: 500 files on disk, 430 read when 70
                # were empty), so writing placeholder empties would make
                # the manifest quietly incomplete anyway — absent is
                # honest, size-0 is a trap.
                continue
            with open(os.path.join(tmp, f"doc_{doc_id:08d}.bin"), "wb") as f:
                f.write(text.encode("utf-8"))
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write("ok")
        publish_dir(tmp, out)
    return out


@register(
    "src_binaryfile_manifest",
    """
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS content_md5
FROM documents
WHERE text IS NOT NULL AND text != ''
ORDER BY doc_id
""",
    ("S*", "X5"),
    "Blob-per-file ingest through Spark's binaryFile source — the layout "
    "a multimodal lake actually has (one image/audio file per object). "
    "The read parallelizes by FILE (each a split; maxPartitionBytes packs "
    "small ones), `length` comes free from the directory listing (no "
    "content read needed for size-based filtering), and `pathGlobFilter` "
    "prunes non-payload files at listing time.  The manifest (id from the "
    "file name, size, content digest) is hash-gated against the documents "
    "table the files were derived from: any corruption in the file "
    "round-trip — encoding, truncation, name/id mapping — fails the gate.",
)
def src_binaryfile_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_doc_files(spark, sf_dir)
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return (
        blobs.select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").alias("n_bytes"),  # from the listing, not content
            F.md5(F.col("content")).alias("content_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text source: line-oriented corpus ingest (one document per line)
# ---------------------------------------------------------------------------

# Bijective line-escape: backslash first, then the delimiters.  The synthetic
# corpus contains neither, but the staging must be correct for real text —
# a doc with embedded newlines/tabs still round-trips to exactly one line.
def _esc(col):  # Spark Column -> Column; literal (non-regex) replaces
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    return F.replace(c, F.lit("\t"), F.lit("\\t"))


# DuckDB strings are escape-free, so spell the backslash as chr(92).
_ESC_SQL = (
    "replace(replace(replace(text, chr(92), chr(92)||chr(92)), "
    "chr(10), chr(92)||'n'), chr(9), chr(92)||'t')"
)


def _stage_doc_lines(spark: SparkSession, sf_dir: str) -> str:
    """documents as one-doc-per-line UTF-8 text (`id<TAB>escaped_text`),
    written BY Spark (distributed, one part-file per partition) once per
    corpus fingerprint."""
    from .sources.staging import STAGE_ROOT, STAGE_VERSION, publish_dir, source_fingerprint

    fp = source_fingerprint(sf_dir, "documents")
    out = os.path.join(STAGE_ROOT, f"doc_lines_{fp}_{STAGE_VERSION}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        tmp = f"{out}.build{os.getpid()}"
        docs = load_table(spark, sf_dir, "documents")
        # One doc per line requires text: concat_ws would silently SKIP a
        # NULL body and emit a tab-less line that parses as garbage.
        lines = docs.filter(F.col("text").isNotNull()).select(
            F.concat_ws(
                "\t", F.col("doc_id").cast("string"), _esc(F.col("text"))
            ).alias("value")
        )
        lines.write.mode("overwrite").text(tmp)
        publish_dir(tmp, out)
    return out


@register(
    "src_text_lines",
    f"""
SELECT doc_id,
       length({_ESC_SQL})::BIGINT AS line_chars,
       len(string_split({_ESC_SQL}, ' '))::BIGINT AS n_tokens,
       md5({_ESC_SQL}) AS line_md5
FROM documents
WHERE text IS NOT NULL
ORDER BY doc_id
""",
    ("S*", "X4"),
    "Line-oriented corpus ingest through spark.read.text — the layout of "
    "most raw LLM training dumps (one JSON/doc per line; here "
    "id<TAB>escaped-text with a bijective backslash escape, so embedded "
    "newlines/tabs in real text still round-trip to one line).  Splitting "
    "is substring_index on the first tab (the body is escape-clean), and "
    "the per-line stats (chars, whitespace tokens, digest) hash-gate the "
    "whole stage-write/read-back loop against the source table.  The "
    "text source splits large files by line boundaries, so a 100 TB dump "
    "parallelizes without a pre-split step.",
)
def src_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_doc_lines(spark, sf_dir)
    lines = spark.read.text(path)
    body = F.substring_index(F.col("value"), "\t", -1)
    # a doc whose text is empty yields "id\t" -> substring_index returns ""
    body = F.when(F.instr(F.col("value"), "\t") > 0, body).otherwise(F.lit(""))
    return (
        lines.select(
            F.substring_index(F.col("value"), "\t", 1).cast("bigint").alias("doc_id"),
            F.length(body).cast("bigint").alias("line_chars"),
            F.size(F.split(body, " ")).cast("bigint").alias("n_tokens"),
            F.md5(body).alias("line_md5"),
        )
        .orderBy("doc_id")
    )
