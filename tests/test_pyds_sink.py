"""The servingstore Python DataSource stream writer (sources/pyds_sink.py):
commit-protocol semantics that the end-to-end registered query
(stream_pyds_serving_store, flagship-oracled) cannot isolate — replay
skipping keyed on (checkpoint epoch, batchId), last-writer-wins keying,
atomic publish, abort applying nothing, the bounded-commit-message
guard, and the option contract."""

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


def _writer(tmp_path, ckpt="ckpt0", **opts):
    o = {"path": str(tmp_path / "store"), "keys": "k"}
    if ckpt is not None:
        # Spark lowercases option keys before they reach the DataSource
        o["checkpointlocation"] = str(tmp_path / ckpt)
    o.update(opts)
    return _ServingStoreStreamWriter(o, SCHEMA)


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
    assert store["epochs"] == {w.epoch: 0}
    assert store["table"][("a",)] == {"k": "a", "n": 1}
    # the NEXT batch applies normally
    w.commit([_RowsCommit([{"k": "a", "n": 2}])], batchId=1)
    assert _table(w)["table"][("a",)] == {"k": "a", "n": 2}
    # ... and replay state stays O(epochs): one id per lineage, not a list
    assert _table(w)["epochs"] == {w.epoch: 1}


def test_replay_skip_survives_query_restart_same_checkpoint(tmp_path):
    # recovery = a NEW writer instance resuming the SAME checkpoint:
    # the epoch is the checkpoint path, so the replayed id still skips
    w1 = _writer(tmp_path, ckpt="ckptA")
    w1.commit([_RowsCommit([{"k": "a", "n": 1}])], batchId=0)
    w2 = _writer(tmp_path, ckpt="ckptA")
    w2.commit([_RowsCommit([{"k": "a", "n": 999}])], batchId=0)
    assert _table(w2)["table"][("a",)] == {"k": "a", "n": 1}


def test_fresh_checkpoint_over_existing_store_applies_batch_zero(tmp_path):
    # the bug batch-id-only keying had: a NEW checkpoint restarts ids at
    # 0, and its real first batch must NOT be discarded as a 'replay'
    w1 = _writer(tmp_path, ckpt="ckptA")
    w1.commit([_RowsCommit([{"k": "a", "n": 1}])], batchId=0)
    w2 = _writer(tmp_path, ckpt="ckptB")
    w2.commit([_RowsCommit([{"k": "a", "n": 2}])], batchId=0)
    store = _table(w2)
    assert store["table"][("a",)] == {"k": "a", "n": 2}
    assert store["epochs"] == {w1.epoch: 0, w2.epoch: 0}


def test_checkpointless_writers_get_distinct_run_epochs(tmp_path):
    # no checkpoint => no recovery replay exists; each run is its own
    # epoch so nothing can ever be misread as a replay of another run
    w1 = _writer(tmp_path, ckpt=None)
    w2 = _writer(tmp_path, ckpt=None)
    assert w1.epoch != w2.epoch
    w1.commit([_RowsCommit([{"k": "a", "n": 1}])], batchId=0)
    w2.commit([_RowsCommit([{"k": "a", "n": 2}])], batchId=0)
    assert _table(w2)["table"][("a",)] == {"k": "a", "n": 2}


def test_oversized_partition_emission_is_loud(tmp_path):
    w = _writer(tmp_path, maxrowsperpartition="3")
    with pytest.raises(RuntimeError, match="exceeded 3 rows"):
        w.write(iter([("k%d" % i, i) for i in range(10)]))
    # at the bound is fine
    assert len(w.write(iter([("k%d" % i, i) for i in range(3)])).rows) == 3


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
