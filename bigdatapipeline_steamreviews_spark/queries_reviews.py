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


@register(
    "review_daily_summary_csv",
    f"""
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
""",
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
