"""S4/S6/A7/T7 — the serving-store sink as a FIRST-CLASS streaming sink
(Spark 4 Python DataSource stream writer), completing the custom
data-source seam the reader half opened (``sources/pyds.py``).

The reference's serving path is a KafkaConsumer thread mutating a global
pandas DataFrame (``/root/reference/visualizer.py:49-79``).  The repo's
first Spark-native replacement is the ``foreachBatch`` keyed merge
(``streaming/serving_sink.py``); this module is the same store contract
behind ``writeStream.format("servingstore")`` — the form a platform team
ships, because the sink then composes with ANY streaming query without
the caller wiring merge code:

* ``write(iterator)`` runs on EXECUTORS, one call per partition, and
  ships the partition's rows back as the (picklable) commit message.
  That is only sane for a BOUNDED-EMISSION KEYED AGGREGATE, in either
  of its two legal modes:

  - UPDATE mode: at most one row per CHANGED group per trigger — a
    micro-batch is bounded by the changed-key count (JVM sinks only as
    of Spark 4.1; kept here because the contract is mode-generic);
  - COMPLETE mode (what the registered ``stream_pyds_serving_store``
    runs, Python writers accepting append/complete only): EVERY group
    re-emits each trigger, so the bound is the TOTAL group count — here
    days x event_types, still a dimension-table-sized constant, never
    the event volume.

  Either way the bound is group cardinality, not input rows.  A
  row-stream sink (unaggregated events) must NOT use this writer; the
  ``maxRowsPerPartition`` guard below turns that misuse into a loud
  executor-side error instead of a silently ballooning commit message.
  Write files on the executor and ship paths instead.
* ``commit(messages, batchId)`` runs on the DRIVER exactly once per
  successful micro-batch, applies last-writer-wins per key, and records
  the batch id UNDER THE RUN'S REPLAY EPOCH — the stream's checkpoint
  location (Spark hands it to the sink in its options).  A replayed
  batch (at-least-once redelivery after recovery resumes the SAME
  checkpoint, T7) carries an already-recorded (epoch, batchId) and is
  SKIPPED, upgrading the store to effectively-once; a FRESH checkpoint
  pointed at an existing store restarts batch ids at 0 under a NEW
  epoch, so its batches apply normally instead of being silently
  discarded as replays (batch-id-only keying had exactly that bug).
  Per epoch only the highest applied id is stored (ids are monotone
  within a checkpoint), so replay state is O(epochs), not O(batches).
* the store file is swapped atomically (tmp + ``os.replace``), so a
  concurrent reader sees the pre- or post-commit table, never a torn
  one.  At 100 TB the commit body targets a transactional table format
  (Delta/Iceberg MERGE) and the commit-message payload becomes staged
  file paths; the protocol (executor stage -> driver atomic publish,
  epoch+batch-id idempotence) is exactly this one.

Spark guarantees ``commit`` is called with ALL task messages only when
every task succeeded, and ``abort`` otherwise — nothing is applied until
commit, so aborts need no cleanup (the staging IS the commit message).
"""

from __future__ import annotations

import os
import pickle
import uuid
from typing import Iterator, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

__all__ = [
    "ServingStoreDataSource",
    "register_serving_store_sink",
    "read_serving_store",
]

# Commit messages travel executor -> driver; a keyed aggregate's per-
# partition emission is group-cardinality-bounded, so anything past this
# is a misuse of the sink (row-stream input), not a big batch.
DEFAULT_MAX_ROWS_PER_PARTITION = 100_000


class _RowsCommit(WriterCommitMessage):
    """One partition's emitted rows (keyed aggregate => bounded)."""

    def __init__(self, rows: list) -> None:
        self.rows = rows


class _ServingStoreStreamWriter(DataSourceStreamWriter):
    def __init__(self, options, schema: StructType) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("servingstore sink requires .option('path', dir)")
        keys = options.get("keys")
        if not keys:
            raise ValueError(
                "servingstore sink requires .option('keys', 'k1,k2')"
            )
        self.path = path
        self.keys = [k.strip() for k in keys.split(",") if k.strip()]
        self.fields = [f.name for f in schema.fields]
        missing = [k for k in self.keys if k not in self.fields]
        if missing:
            raise ValueError(f"key columns not in stream schema: {missing}")
        self.schema_json = schema.json()
        self.max_rows = int(
            options.get("maxrowsperpartition", DEFAULT_MAX_ROWS_PER_PARTITION)
        )
        # Replay epoch: batch ids are only comparable WITHIN one
        # checkpoint lineage (a fresh checkpoint restarts at 0).  Spark
        # passes the stream's checkpointLocation through the sink
        # options (keys lowercased); a checkpoint-less stream cannot
        # recover-and-replay, so a per-run token is exact there.
        #
        # r14 ADVICE (pyds_sink.py:117): a stream whose checkpoint comes
        # from the ``spark.sql.streaming.checkpointLocation`` SESSION
        # DEFAULT recovers-and-replays too, but Spark does not surface
        # the resolved per-query subdirectory (<default>/<name-or-uuid>)
        # in the sink options — a per-run uuid epoch would re-apply the
        # replayed batch instead of skipping it.  We cannot reconstruct
        # the lineage key from here, so that configuration is REJECTED
        # loudly: the sink requires checkpointLocation as an explicit
        # writer option whenever a session default would otherwise kick
        # in.  (streamWriter() is constructed driver-side, so the active
        # session is visible; executors only unpickle the result.)
        ckpt = options.get("checkpointlocation")
        if ckpt:
            self.epoch = os.path.abspath(ckpt)
        else:
            session_default = None
            try:
                from pyspark.sql import SparkSession

                active = SparkSession.getActiveSession()
                if active is not None:
                    session_default = active.conf.get(
                        "spark.sql.streaming.checkpointLocation", None
                    )
            except Exception:
                session_default = None  # executor-side unpickle: no session
            if session_default:
                raise ValueError(
                    "servingstore sink: the session default "
                    "spark.sql.streaming.checkpointLocation is set, so this "
                    "stream will checkpoint (and replay on restart) under a "
                    "directory the sink cannot see — pass the SAME path as "
                    ".option('checkpointLocation', ...) on the writer so "
                    "replayed batches are recognized and skipped"
                )
            self.epoch = f"run-{uuid.uuid4().hex}"

    # -- executor side ------------------------------------------------
    def write(self, iterator: Iterator) -> WriterCommitMessage:
        # Rows are pickled as plain dicts; within a partition, arrival
        # order is preserved so the last occurrence of a key wins below.
        rows = []
        for row in iterator:
            rows.append(dict(zip(self.fields, row)))
            if len(rows) > self.max_rows:
                raise RuntimeError(
                    "servingstore commit message exceeded "
                    f"{self.max_rows} rows in one partition — this sink "
                    "is for keyed aggregates (bounded by group count); "
                    "a row-stream must stage executor-side files instead. "
                    "Raise .option('maxRowsPerPartition', n) only if the "
                    "GROUP cardinality really is this large."
                )
        return _RowsCommit(rows)

    # -- driver side ----------------------------------------------------
    def _store_file(self) -> str:
        return os.path.join(self.path, "store.pkl")

    def _load(self) -> dict:
        f = self._store_file()
        if os.path.exists(f):
            with open(f, "rb") as fh:
                return pickle.load(fh)
        return {"epochs": {}, "table": {}, "schema_json": self.schema_json}

    def commit(
        self, messages: List[Optional[WriterCommitMessage]], batchId: int
    ) -> None:
        store = self._load()
        # migrate a pre-epoch store (r13 format kept only a batch-id
        # list): its ids are not attributable to a lineage, so they
        # cannot be used to skip — start epoch tracking fresh
        store.setdefault("epochs", {})
        # at-least-once replay: same checkpoint lineage re-delivers an
        # id at or below the highest applied; a DIFFERENT epoch's ids
        # never match, so a fresh checkpoint over an old store applies.
        if batchId <= store["epochs"].get(self.epoch, -1):
            return
        table = store["table"]
        for msg in messages:
            if msg is None:  # contract: None only accompanies task failure
                raise RuntimeError(
                    f"commit called with a missing task message, batch {batchId}"
                )
            for row in msg.rows:
                # last-writer-wins per key; a keyed aggregate emits each
                # key at most once per trigger, so cross-partition order
                # within a batch cannot matter
                table[tuple(row[k] for k in self.keys)] = row
        store["epochs"][self.epoch] = batchId
        os.makedirs(self.path, exist_ok=True)
        tmp = self._store_file() + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(store, fh)
        os.replace(tmp, self._store_file())  # atomic publish

    def abort(
        self, messages: List[Optional[WriterCommitMessage]], batchId: int
    ) -> None:
        # nothing was applied until commit; the failed batch re-runs whole
        return


class ServingStoreDataSource(DataSource):
    """``writeStream.format("servingstore")`` — keyed upsert serving store."""

    @classmethod
    def name(cls) -> str:
        return "servingstore"

    def schema(self) -> str:
        # write-only source: reads go through read_serving_store()
        return "key string"

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _ServingStoreStreamWriter(self.options, schema)


def register_serving_store_sink(spark: SparkSession) -> None:
    spark.dataSource.register(ServingStoreDataSource)


def read_serving_store(spark: SparkSession, path: str) -> DataFrame:
    """The store as a batch DataFrame (the visualizer's read side)."""
    import json as _json

    f = os.path.join(path, "store.pkl")
    with open(f, "rb") as fh:
        store = pickle.load(fh)
    schema = StructType.fromJson(_json.loads(store["schema_json"]))
    names = [fld.name for fld in schema.fields]
    rows = [tuple(r.get(n) for n in names) for r in store["table"].values()]
    return spark.createDataFrame(rows, schema=schema)
