"""The servingstore Python DataSource stream writer (sources/pyds_sink.py):
commit-protocol semantics that the end-to-end registered query
(stream_pyds_serving_store, flagship-oracled) cannot isolate — batch-id
replay skipping, last-writer-wins keying, atomic publish, abort applying
nothing, and the option contract."""

from __future__ import annotations

import os
import pickle

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdatapipeline_steamreviews_spark.sources.pyds_sink import (
    _RowsCommit,
    _ServingStoreStreamWriter,
    read_serving_store,
)

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("n", LongType()),
    ]
)


def _writer(tmp_path):
    return _ServingStoreStreamWriter(
        {"path": str(tmp_path / "store"), "keys": "k"}, SCHEMA
    )


def _table(w):
    with open(w._store_file(), "rb") as fh:
        return pickle.load(fh)


def test_replayed_batch_is_skipped_not_remerged(tmp_path):
    w = _writer(tmp_path)
    w.commit([_RowsCommit([{"k": "a", "n": 1}])], batchId=0)
    # recovery replay of batch 0 with DIFFERENT content (at-least-once
    # redelivery after a partial failure) must be ignored entirely
    w.commit([_RowsCommit([{"k": "a", "n": 999}])], batchId=0)
    store = _table(w)
    assert store["batches"] == [0]
    assert store["table"][("a",)] == {"k": "a", "n": 1}
    # the NEXT batch applies normally
    w.commit([_RowsCommit([{"k": "a", "n": 2}])], batchId=1)
    assert _table(w)["table"][("a",)] == {"k": "a", "n": 2}


def test_last_writer_wins_within_and_across_messages(tmp_path):
    w = _writer(tmp_path)
    w.commit(
        [
            _RowsCommit([{"k": "a", "n": 1}, {"k": "a", "n": 2}]),
            _RowsCommit([{"k": "b", "n": 7}]),
        ],
        batchId=0,
    )
    t = _table(w)["table"]
    assert t[("a",)]["n"] == 2 and t[("b",)]["n"] == 7


def test_abort_applies_nothing_and_missing_message_refuses(tmp_path):
    w = _writer(tmp_path)
    w.abort([_RowsCommit([{"k": "a", "n": 1}])], batchId=0)
    assert not os.path.exists(w._store_file())
    with pytest.raises(RuntimeError, match="missing task message"):
        w.commit([None], batchId=0)
    assert not os.path.exists(w._store_file())


def test_write_ships_rows_and_roundtrips_through_read(tmp_path, spark):
    w = _writer(tmp_path)
    msg = w.write(iter([("a", 1), ("b", 2)]))
    assert msg.rows == [{"k": "a", "n": 1}, {"k": "b", "n": 2}]
    w.commit([msg], batchId=0)
    out = read_serving_store(spark, str(tmp_path / "store"))
    assert out.schema == SCHEMA
    assert {(r["k"], r["n"]) for r in out.collect()} == {("a", 1), ("b", 2)}


def test_option_contract_is_loud(tmp_path):
    with pytest.raises(ValueError, match="requires .option\\('path'"):
        _ServingStoreStreamWriter({"keys": "k"}, SCHEMA)
    with pytest.raises(ValueError, match="requires .option\\('keys'"):
        _ServingStoreStreamWriter({"path": str(tmp_path)}, SCHEMA)
    with pytest.raises(ValueError, match="not in stream schema"):
        _ServingStoreStreamWriter(
            {"path": str(tmp_path), "keys": "nope"}, SCHEMA
        )
