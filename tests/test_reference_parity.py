"""Parity tests against the reference's exact semantics: the 24-column
review pipeline (summarizer.py), the CSV producer source
(stream_generator.py), and the Kafka wire-format expressions.
"""

from __future__ import annotations

import json
import textwrap

from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.aggregations import (
    review_daily_summary,
)
from bigdatapipeline_steamreviews_spark.schemas import (
    REVIEW_CSV_COLUMNS,
    REVIEW_SCHEMA,
    SUMMARY_SCHEMA,
)
from bigdatapipeline_steamreviews_spark.sources.kafka import (
    encode_json_output,
    parse_json_values,
)
from bigdatapipeline_steamreviews_spark.sources.tables import read_reviews_csv


def _review_row(idx, app, rid, ts, recommended, sentiment, playtime):
    """One 24-field review row with only the fields the summary uses."""
    base = {c: None for c in REVIEW_CSV_COLUMNS}
    base.update(
        index=idx, app_id=app, app_name=f"game{app}", review_id=rid,
        timestamp_created=ts, recommended=recommended, sentiment=sentiment,
        author_playtime_at_review=playtime,
    )
    return tuple(base[c] for c in REVIEW_CSV_COLUMNS)


DAY = 86400


def test_review_daily_summary_golden(spark):
    """The reference summarizer's aggregates, including the quirks:
    recommended null->False; playtime minutes->hours; sentiment sign
    flags; window.end as `time` (summarizer.py:61-100)."""
    rows = [
        _review_row(0, 1, 100, DAY * 10 + 100, "true", 0.5, 120.0),
        _review_row(1, 1, 101, DAY * 10 + 200, "false", -0.25, 60.0),
        _review_row(2, 1, 102, DAY * 10 + 300, None, 0.0, None),
        _review_row(3, 1, 103, DAY * 11 + 10, "true", 1.0, 30.0),  # next day
        _review_row(4, 2, 104, DAY * 10 + 50, "garbage", 0.75, 90.0),
    ]
    df = spark.createDataFrame(rows, REVIEW_SCHEMA)
    got = {
        (r.app_id, r.time.day): r
        for r in review_daily_summary(df).collect()
    }
    d1 = got[(1, 12)]  # window [day10, day11) -> end = day 11 of Jan 1970 + 1
    assert d1.T_reviews == 3
    assert d1.T_recommendations == 1  # "true" only; null and "false" are False
    assert d1.T_pos_reviews == 1 and d1.T_neg_reviews == 1  # 0.0 is neither
    assert d1.A_playtime == (2.0 + 1.0) / 2  # minutes/60, null skipped by avg
    d2 = got[(1, 13)]
    assert d2.T_reviews == 1 and d2.T_recommendations == 1
    g2 = got[(2, 12)]
    assert g2.T_recommendations == 0  # "garbage" -> False (otherwise branch)
    # output schema contract matches the declared summary schema
    out = review_daily_summary(df)
    assert [f.name for f in out.schema.fields] == [f.name for f in SUMMARY_SCHEMA.fields]


def test_read_reviews_csv_quoted_escaped(spark, tmp_path):
    """S1 — headerless CSV with quoting/escaping, positional 24-column
    schema (stream_generator.py:49-50)."""
    row = _review_row(0, 7, 900, 1000, "true", 0.5, 10.0)
    vals = []
    for v in row:
        if v is None:
            vals.append("")
        elif isinstance(v, str):
            vals.append('"' + v + '"')
        else:
            vals.append(str(v))
    # a quoted review text with comma and an escaped quote
    vals[5] = '"great, \\"addictive\\" game"'
    csv_path = str(tmp_path / "reviews.csv")
    with open(csv_path, "w") as f:
        f.write(",".join(vals) + "\n")
    df = read_reviews_csv(spark, csv_path)
    r = df.collect()[0]
    assert r.app_id == 7 and r.app_name == "game7"
    assert r.review == 'great, "addictive" game'
    assert r.sentiment == 0.5
    assert len(df.columns) == 24


def test_kafka_wire_format_roundtrip(spark):
    """P1/P2 + S4/S5 wire contract: to_json(struct(*)) with string key out,
    CAST + from_json + star-expand in (summarizer.py:61-63,104) — encode
    then parse must be the identity on the data columns."""
    rows = [(1, "game1", 0.5), (2, "game2", -1.0)]
    df = spark.createDataFrame(rows, "app_id long, app_name string, sentiment double")
    encoded = encode_json_output(df, "app_id")
    enc_rows = encoded.collect()
    assert {r.key for r in enc_rows} == {"1", "2"}
    assert json.loads(enc_rows[0].value).keys() == {"app_id", "app_name", "sentiment"}
    # simulate the consumer side: value arrives as binary
    wire = encoded.select(F.encode(F.col("value"), "UTF-8").alias("value"))
    decoded = parse_json_values(wire, df.schema)
    assert sorted(decoded.collect()) == sorted(df.collect())
