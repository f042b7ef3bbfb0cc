"""Schema-drift canary (round-3 postmortem): the driver's testdata has
changed the physical encoding of ``events.ts`` between rounds (parquet
TIMESTAMP(NANOS) in rounds 1-2, plain TIMESTAMP micros in round 3+), and
the loader must adapt instead of assuming one encoding.  If the
environment drifts again, THIS file fails with a named assertion instead
of 15 mystery-red tests.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from bigdatapipeline_steamreviews_spark.sources.tables import (
    TABLE_NAMES,
    event_ts_micros,
    load_table,
    normalize_event_ts,
)
from tests.conftest import SF_DIR

# The canonical loader output for every table: column -> Spark type name.
# Key columns only — a driver-side column ADDITION is tolerated (and
# surfaced by the canary's else-branch), a type change is not.
_CANONICAL_EVENTS = {
    "event_id": T.LongType(),
    "ts": T.TimestampType(),
    "user_id": T.LongType(),
    "event_type": T.StringType(),
    "value": T.DoubleType(),
    "props": T.StringType(),
}

_TS_MICROS = [
    1_700_000_000_000_000,
    1_700_000_123_456_789,
    1_700_086_400_000_001,
]


def _write_events_variant(path: str, arrow_ts_type) -> None:
    """One synthetic events.parquet with ts in the given arrow encoding."""
    if arrow_ts_type is not None and pa.types.is_timestamp(arrow_ts_type):
        unit = arrow_ts_type.unit
        scale = {"s": 10**-6, "ms": 10**-3, "us": 1, "ns": 10**3}[unit]
        ts_vals = [int(v * scale) for v in _TS_MICROS]
        ts_arr = pa.array(ts_vals, type=pa.int64()).cast(arrow_ts_type)
    else:
        ts_arr = pa.array([v * 1000 for v in _TS_MICROS], type=pa.int64())  # nanos
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([10, 11, 12], type=pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0], type=pa.float64()),
            "props": pa.array(['{"k":1}', '{"k":2}', '{"k":3}']),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize(
    "label,arrow_type,unit_micros",
    [
        ("nanos", pa.timestamp("ns"), 1),          # rounds 1-2 driver encoding
        ("micros_ntz", pa.timestamp("us"), 1),     # round 3+ driver encoding
        ("micros_utc", pa.timestamp("us", tz="UTC"), 1),   # plausible next drift
        ("nanos_utc", pa.timestamp("ns", tz="UTC"), 1),    # tz-adjusted nanos
        ("millis_ntz", pa.timestamp("ms"), 1000),  # coarser logical unit
        ("int64_nanos", None, 1),                  # raw epoch-nanos BIGINT column
    ],
)
def test_events_ts_encoding_drift(spark, tmp_path, label, arrow_type, unit_micros):
    """load_table returns the SAME canonical (TimestampType, UTC wall-clock)
    values whatever the parquet's physical timestamp encoding — identical
    logical data in any encoding the driver has shipped (or plausibly
    could) normalizes to identical rows.  ``unit_micros`` is the encoding's
    precision: values are truncated to it on write, so the expectation
    truncates identically."""
    d = tmp_path / label
    d.mkdir()
    _write_events_variant(str(d / "events.parquet"), arrow_type)
    df = load_table(spark, str(d), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"{label}: loader returned {df.schema['ts'].dataType}, expected TIMESTAMP"
    )
    logical_micros = [v // unit_micros * unit_micros for v in _TS_MICROS]
    got = [r.ts for r in df.orderBy("event_id").collect()]
    want = [
        datetime.datetime.fromtimestamp(v / 1e6, tz=datetime.timezone.utc).replace(
            tzinfo=None
        )
        for v in logical_micros
    ]
    assert got == want, f"{label}: wall-clock drifted: {got} != {want}"

    # The staged-replay form is micros-long for every encoding too.
    raw = spark.read.parquet(str(d / "events.parquet"))
    micros = event_ts_micros(raw)
    assert isinstance(micros.schema["ts"].dataType, T.LongType)
    assert sorted(r.ts for r in micros.collect()) == sorted(logical_micros)


def test_normalize_rejects_unknown_type(spark):
    df = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="unsupported event-time type"):
        normalize_event_ts(df)


def test_all_tables_load_with_canonical_schema(spark):
    """Every driver table loads; events matches the canonical column types.
    A new driver encoding that the loader can't normalize fails HERE with
    the table name in the message."""
    for name in TABLE_NAMES:
        df = load_table(spark, SF_DIR, name)
        assert df.columns, f"{name}: empty schema"
        if name == "events":
            for col, want in _CANONICAL_EVENTS.items():
                got = df.schema[col].dataType
                assert got == want, f"events.{col}: {got} != canonical {want}"
