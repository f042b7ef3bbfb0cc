"""Schema registry — fixed, explicit schemas, never inferred on the hot path.

Mirrors the reference's declared 24-field review schema
(``/root/reference/summarizer.py:24-49``: hand-written ``StructType`` applied
via ``from_json``) and the 11-column serving schema
(``/root/reference/visualizer.py:30-42``).  Streaming JSON *requires* a
declared schema; batch parquet carries its own footer schema, but we still
declare the driver test tables here as contracts so a schema drift in input
data fails loudly at analysis time instead of silently at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "REVIEW_SCHEMA",
    "SUMMARY_SCHEMA",
    "SERVING_SCHEMA",
    "EVENT_SCHEMA",
    "EVENT_PROPS_SCHEMA",
    "REVIEW_CSV_COLUMNS",
]

# The streaming input row: 24 fields, first four non-nullable.
# Ref: /root/reference/summarizer.py:24-49 (types + nullability),
#      /root/reference/stream_generator.py:15-40 (positional CSV names).
REVIEW_SCHEMA = T.StructType(
    [
        T.StructField("index", T.LongType(), False),
        T.StructField("app_id", T.LongType(), False),
        T.StructField("app_name", T.StringType(), False),
        T.StructField("review_id", T.LongType(), False),
        T.StructField("language", T.StringType(), True),
        T.StructField("review", T.StringType(), True),
        T.StructField("timestamp_created", T.LongType(), True),
        T.StructField("timestamp_updated", T.LongType(), True),
        # "recommended" arrives as the *string* "true"/"false"; normalized to
        # boolean with null->False downstream (ref summarizer.py:33,68-70).
        T.StructField("recommended", T.StringType(), True),
        T.StructField("votes_helpful", T.IntegerType(), True),
        T.StructField("votes_funny", T.IntegerType(), True),
        T.StructField("weighted_vote_score", T.FloatType(), True),
        T.StructField("comment_count", T.IntegerType(), True),
        T.StructField("steam_purchase", T.BooleanType(), True),
        T.StructField("received_for_free", T.BooleanType(), True),
        T.StructField("written_during_early_access", T.BooleanType(), True),
        T.StructField("author_steamid", T.StringType(), True),
        T.StructField("author_num_games_owned", T.IntegerType(), True),
        T.StructField("author_num_reviews", T.IntegerType(), True),
        T.StructField("author_playtime_forever", T.DoubleType(), True),
        T.StructField("author_playtime_last_two_weeks", T.DoubleType(), True),
        T.StructField("author_playtime_at_review", T.DoubleType(), True),
        T.StructField("author_last_played", T.FloatType(), True),
        T.StructField("sentiment", T.FloatType(), True),
    ]
)

# Positional CSV column order for the producer-side read
# (ref stream_generator.py:15-40,49-50: header=None + assigned names).
REVIEW_CSV_COLUMNS = [f.name for f in REVIEW_SCHEMA.fields]

# The windowed-aggregate output row (ref summarizer.py:90-100).
SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("app_id", T.LongType(), True),
        T.StructField("app_name", T.StringType(), True),
        T.StructField("time", T.TimestampType(), True),
        T.StructField("A_playtime", T.DoubleType(), True),
        T.StructField("A_sentiment", T.DoubleType(), True),
        T.StructField("T_reviews", T.LongType(), True),
        T.StructField("T_recommendations", T.LongType(), True),
        T.StructField("T_pos_reviews", T.LongType(), True),
        T.StructField("T_neg_reviews", T.LongType(), True),
    ]
)

# The materialized serving table keyed by (app_id, year, month, day)
# (ref visualizer.py:30-42 narrow dtypes; we keep natural Spark types and let
# parquet encoding handle width — see SURVEY.md §1.2).
SERVING_SCHEMA = T.StructType(
    [
        T.StructField("app_id", T.LongType(), True),
        T.StructField("app_name", T.StringType(), True),
        T.StructField("time_year", T.IntegerType(), True),
        T.StructField("time_month", T.IntegerType(), True),
        T.StructField("time_day", T.IntegerType(), True),
        T.StructField("A_playtime", T.DoubleType(), True),
        T.StructField("A_sentiment", T.DoubleType(), True),
        T.StructField("T_reviews", T.LongType(), True),
        T.StructField("T_recommendations", T.LongType(), True),
        T.StructField("T_pos_reviews", T.LongType(), True),
        T.StructField("T_neg_reviews", T.LongType(), True),
    ]
)

# Driver test table `events` — the streaming stand-in for the review feed
# (mapping in FIXTURES.md §B: event_id≈review_id, ts≈timestamp_created,
# event_type≈app key, value≈sentiment/playtime measure, props≈JSON extras).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# Declared schema for the JSON `props` payload (parsed like the reference
# parses review JSON: from_json with explicit schema, summarizer.py:62).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])
