"""The reference pipeline on its NATIVE 24-column review schema, oracle-
gated end-to-end: a checked-in quoted/escaped CSV fixture (the shape of
``sampled_steam_reviews_with_sentiment.csv``, ref stream_generator.py:49-50)
read by ``read_reviews_csv`` (S1) and aggregated by ``review_daily_summary``
(A1-A4 + P3/P5/P6/P8, ref summarizer.py:61-100), compared against DuckDB
running ``read_csv`` with the same quote/escape dialect on the same file.

The driver's parquet testdata carries the review semantics via the `events`
table; this module closes the one gap that left (r1 verdict "what's
missing" #3): no oracle row ever exercised the real CSV dialect, the
string->bool ``recommended`` normalization, or the 24-field positional
schema on review-shaped data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .operators.aggregations import review_daily_summary
from .registry import _avg_exact_sql, _count_if_sql, register
from .sources.tables import read_reviews_csv

# The fixture ships with the repo; the oracle needs the same absolute path.
REVIEWS_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "steam_reviews_sample.csv",
)

_CSV_COLUMNS_SQL = """
  columns={
    'index': 'BIGINT', 'app_id': 'BIGINT', 'app_name': 'VARCHAR',
    'review_id': 'BIGINT', 'language': 'VARCHAR', 'review': 'VARCHAR',
    'timestamp_created': 'BIGINT', 'timestamp_updated': 'BIGINT',
    'recommended': 'VARCHAR', 'votes_helpful': 'INTEGER',
    'votes_funny': 'INTEGER', 'weighted_vote_score': 'FLOAT',
    'comment_count': 'INTEGER', 'steam_purchase': 'BOOLEAN',
    'received_for_free': 'BOOLEAN', 'written_during_early_access': 'BOOLEAN',
    'author_steamid': 'VARCHAR', 'author_num_games_owned': 'INTEGER',
    'author_num_reviews': 'INTEGER', 'author_playtime_forever': 'DOUBLE',
    'author_playtime_last_two_weeks': 'DOUBLE',
    'author_playtime_at_review': 'DOUBLE', 'author_last_played': 'FLOAT',
    'sentiment': 'FLOAT'
  }
"""


# Shared by the CSV scan query and the two Python-DataSource front-ends:
# all three read the SAME fixture through different source machinery and
# must hash-match the same DuckDB re-read.
REVIEW_SUMMARY_ORACLE = f"""
SELECT app_id, app_name,
       date_trunc('day', make_timestamp(timestamp_created * 1000000))
         + INTERVAL 1 DAY AS time,
       {_avg_exact_sql('author_playtime_at_review / 60.0')} AS A_playtime,
       {_avg_exact_sql('CAST(sentiment AS DOUBLE)')} AS A_sentiment,
       count(*) AS T_reviews,
       {_count_if_sql("recommended = 'true'")} AS T_recommendations,
       {_count_if_sql('sentiment > 0.0')} AS T_pos_reviews,
       {_count_if_sql('sentiment < 0.0')} AS T_neg_reviews
FROM read_csv('{REVIEWS_FIXTURE}',
  header=false, quote='"', escape='\\', sep=',',
  {_CSV_COLUMNS_SQL})
GROUP BY 1, 2, 3
"""


@register(
    "review_daily_summary_csv",
    REVIEW_SUMMARY_ORACLE,
    ("S1", "A1", "A2", "A3", "A4", "P3", "P5", "P6", "P8"),
    "The reference summarizer on its native 24-column review schema: "
    "quoted/escaped positional CSV scan (stream_generator.py:49-50) -> "
    "epoch->timestamp, playtime/60, string->bool recommended with "
    "null->False (summarizer.py:66-70) -> 1-day window groupBy(app) with "
    "avg/count/count-if aggregates (summarizer.py:76-100). The oracle "
    "re-reads the same CSV with DuckDB's parser in the same dialect, so "
    "the gate covers the scan itself, not just the aggregation. (The "
    "float32 sentiment column routes through DOUBLE before the DECIMAL "
    "accumulator on both sides: DuckDB's direct FLOAT->DECIMAL cast "
    "scales in float32 arithmetic and loses last-digit parity.)",
)
def review_daily_summary_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The review corpus is a repo fixture (driver testdata has no
    # review-shaped CSV); sf_dir is unused by design.
    return review_daily_summary(read_reviews_csv(spark, REVIEWS_FIXTURE))


DIRTY_FIXTURE = os.path.join(
    os.path.dirname(REVIEWS_FIXTURE), "steam_reviews_dirty.csv"
)

# Read-everything-as-text schema: same 24 positional names, all VARCHAR, so
# no row can poison the scan; typing happens per-field afterwards, where a
# failure is a classifiable fact instead of a parse abort.
_REVIEW_COLS = [
    "index", "app_id", "app_name", "review_id", "language", "review",
    "timestamp_created", "timestamp_updated", "recommended", "votes_helpful",
    "votes_funny", "weighted_vote_score", "comment_count", "steam_purchase",
    "received_for_free", "written_during_early_access", "author_steamid",
    "author_num_games_owned", "author_num_reviews", "author_playtime_forever",
    "author_playtime_last_two_weeks", "author_playtime_at_review",
    "author_last_played", "sentiment",
]

_ALL_VARCHAR_SQL = (
    "columns={" + ", ".join(f"'{c}': 'VARCHAR'" for c in _REVIEW_COLS) + "}"
)


@register(
    "src_csv_dirty_rows",
    f"""
WITH raw AS (
  SELECT * FROM read_csv('{{DIRTY_FIXTURE}}',
    header=false, quote='"', escape='\\', sep=',', null_padding=true,
    auto_detect=false, {_ALL_VARCHAR_SQL})
),
classified AS (
  SELECT CASE
           WHEN author_steamid IS NULL THEN 'short_row'
           WHEN TRY_CAST(timestamp_created AS BIGINT) IS NULL
             THEN 'bad_timestamp'
           WHEN TRY_CAST(sentiment AS DOUBLE) IS NULL THEN 'bad_sentiment'
           ELSE 'ok' END AS reason,
         TRY_CAST(index AS BIGINT) AS idx
  FROM raw
)
SELECT reason, count(*) AS n_rows, min(idx) AS first_index
FROM classified GROUP BY reason
""".replace("{DIRTY_FIXTURE}", DIRTY_FIXTURE),
    ("S1", "P*"),
    "Dirty-source triage: the review CSV read with an all-VARCHAR declared "
    "schema (PERMISSIVE — a malformed record cannot abort the scan), then "
    "per-field typing with permissive casts classifies every row into "
    "short_row / bad_timestamp / bad_sentiment / ok with a fixed priority "
    "— the quarantine-vs-ingest split a production loader branches on. "
    "The oracle re-reads the same file with DuckDB's parser (null_padding) "
    "and TRY_CAST, so the gate covers the lenient scan itself.",
)
def src_csv_dirty_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in _REVIEW_COLS]
    )
    raw = (
        spark.read.schema(schema)
        .options(header=False, quote='"', escape="\\", sep=",", mode="PERMISSIVE")
        .csv(DIRTY_FIXTURE)
    )
    reason = (
        F.when(F.col("author_steamid").isNull(), F.lit("short_row"))
        .when(F.col("timestamp_created").cast("bigint").isNull(), F.lit("bad_timestamp"))
        .when(F.col("sentiment").cast("double").isNull(), F.lit("bad_sentiment"))
        .otherwise(F.lit("ok"))
    )
    return (
        raw.select(reason.alias("reason"), F.col("index").cast("bigint").alias("idx"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.min("idx").alias("first_index"))
    )


# ---------------------------------------------------------------------------
# Dirty JSON-lines triage (the JSON twin of src_csv_dirty_rows)
# ---------------------------------------------------------------------------

DIRTY_JSONL_FIXTURE = os.path.join(
    os.path.dirname(REVIEWS_FIXTURE), "events_dirty.jsonl"
)


@register(
    "src_json_dirty_rows",
    """
WITH raw AS (
  SELECT line FROM read_csv('{FIXTURE}',
    header=false, sep='\\t', quote='', escape='',
    auto_detect=false, columns={'line': 'VARCHAR'})
),
classified AS (
  SELECT CASE
           WHEN NOT json_valid(line) THEN 'corrupt'
           WHEN json_extract_string(line::JSON, '$.event_id') IS NULL
             THEN 'missing_id'
           WHEN TRY_CAST(json_extract_string(line::JSON, '$.event_id')
                         AS BIGINT) IS NULL THEN 'bad_id'
           WHEN TRY_CAST(json_extract_string(line::JSON, '$.value')
                         AS DOUBLE) IS NULL THEN 'bad_value'
           ELSE 'ok' END AS reason
  FROM raw
)
SELECT reason, count(*) AS n_rows FROM classified GROUP BY reason
""".replace("{FIXTURE}", DIRTY_JSONL_FIXTURE),
    ("S*", "P2"),
    "Dirty JSON-lines triage: the feed read as RAW TEXT LINES (a corrupt "
    "record cannot abort the scan or silently vanish, unlike DuckDB's "
    "ignore_errors or a DROPMALFORMED json read), then classified corrupt "
    "/ missing_id / bad_id / bad_value / ok with a fixed priority — the "
    "quarantine split, with every malformed line still COUNTED.  Spark "
    "validity = get_json_object(line, '$'); oracle validity = "
    "json_valid(line) — both Jackson and yyjson reject the fixture's "
    "malformations identically (trailing-garbage lines, where the two "
    "parsers disagree, are kept out of the contract by construction).",
)
def src_json_dirty_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    raw = spark.read.text(DIRTY_JSONL_FIXTURE)
    line = F.col("value")
    reason = (
        F.when(F.get_json_object(line, "$").isNull(), F.lit("corrupt"))
        .when(F.get_json_object(line, "$.event_id").isNull(), F.lit("missing_id"))
        .when(
            F.get_json_object(line, "$.event_id").cast("bigint").isNull(),
            F.lit("bad_id"),
        )
        .when(
            F.get_json_object(line, "$.value").cast("double").isNull(),
            F.lit("bad_value"),
        )
        .otherwise(F.lit("ok"))
    )
    return (
        raw.select(reason.alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource front-ends (batch + streaming) for the review
# wire format — sources/pyds.py
# ---------------------------------------------------------------------------


@register(
    "src_pyds_review_summary",
    REVIEW_SUMMARY_ORACLE,
    ("S1", "S2", "A1"),
    "The review summary through a CUSTOM Spark 4 Python DataSource "
    "(format 'steamreviews'): Catalyst plans one input partition per CSV "
    "file, each parsed by pyarrow's C++ reader in the reference dialect "
    "and handed over as Arrow RecordBatches (no Python-per-row work). "
    "Same fixture, same oracle as review_daily_summary_csv — the gate "
    "proves the pluggable source is byte-equivalent to the built-in scan.",
)
def src_pyds_review_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.aggregations import review_daily_summary as _summary
    from .sources.pyds import register_steamreviews_source

    register_steamreviews_source(spark)
    reviews = spark.read.format("steamreviews").load(REVIEWS_FIXTURE)
    return _summary(reviews)


@register(
    "stream_pyds_review_summary",
    REVIEW_SUMMARY_ORACLE,
    ("S2", "S3", "T1", "T5"),
    "The review summary as a STREAM from the custom Python DataSource's "
    "DataSourceStreamReader: row-range offsets over the static file "
    "(rows_per_batch per partition), drained availableNow into the "
    "windowed aggregate and materialized complete-mode — the reference's "
    "generator-feeds-summarizer loop (stream_generator.py:45-55 -> "
    "summarizer.py:103-111) with the custom source replacing the broker. "
    "Must hash-match the batch oracle exactly: the incremental plan and "
    "the batch plan are the same logical query.",
)
def stream_pyds_review_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .operators.aggregations import review_daily_summary as _summary
    from .sources.pyds import register_steamreviews_source
    from .streaming.summarizer import run_to_memory_table

    register_steamreviews_source(spark)
    stream = (
        spark.readStream.format("steamreviews")
        .option("rows_per_batch", "8")
        .load(REVIEWS_FIXTURE)
    )
    result = _summary(stream)
    ckpt = tempfile.mkdtemp(prefix="pyds_review_ckpt_")
    return run_to_memory_table(
        result,
        "pyds_review_summary",
        ckpt,
        output_mode="complete",
        shuffle_partitions=4,
    )


MULTILINE_FIXTURE = os.path.join(
    os.path.dirname(REVIEWS_FIXTURE), "steam_reviews_multiline.csv"
)


@register(
    "src_csv_multiline_rows",
    f"""
SELECT review_id,
       length(review)::BIGINT AS n_chars,
       (length(review) - length(replace(review, chr(10), '')))::BIGINT
         AS n_newlines,
       md5(review) AS review_md5
FROM read_csv('{{FIXTURE}}',
  header=false, quote='"', escape='\\', sep=',',
  {_CSV_COLUMNS_SQL})
ORDER BY review_id
""".replace("{FIXTURE}", MULTILINE_FIXTURE),
    ("S1", "P*"),
    "Quoted fields with EMBEDDED NEWLINES (real review text wraps): the "
    "scan runs with multiLine=true, which trades line-boundary file "
    "splitting for whole-file records — the correctness/parallelism "
    "trade a 100 TB CSV ingest must make explicitly (multiLine files "
    "parallelize per FILE, like the pyds source; newline-free dumps "
    "keep intra-file splits).  Gated per record (newline counts + "
    "content digest) against DuckDB's parser on the same bytes, "
    "including a row mixing escaped quotes AND a newline in one field.",
)
def src_csv_multiline_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .sources.tables import REVIEW_SCHEMA

    from .session import ensure_parity_conf  # noqa: F811 - explicit pin

    ensure_parity_conf(spark)
    raw = (
        spark.read.schema(REVIEW_SCHEMA)
        .options(
            header=False,
            quote='"',
            escape="\\",
            sep=",",
            multiLine=True,
            mode="PERMISSIVE",
        )
        .csv(MULTILINE_FIXTURE)
    )
    newline_free = F.replace(F.col("review"), F.lit("\n"), F.lit(""))
    return raw.select(
        "review_id",
        F.length("review").cast("long").alias("n_chars"),
        (F.length("review") - F.length(newline_free)).cast("long").alias(
            "n_newlines"
        ),
        F.md5(F.col("review")).alias("review_md5"),
    ).orderBy("review_id")
