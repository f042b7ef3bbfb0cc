"""Spark 4 Python DataSource for the reference's review-CSV wire format.

The reference feeds its pipeline by driving the 24-column review CSV
through pandas + a Kafka producer (``/root/reference/stream_generator.py:
45-55``).  Spark 4's Python DataSource API lets the same wire format be a
first-class ``spark.read.format("steamreviews")`` source instead — planned
by Catalyst (partition per file), executed Arrow-vectorized (the reader
yields ``pyarrow.RecordBatch`` objects, never Python rows), and reusable
from SQL and streaming alike.

Two readers:

* **batch** — one ``InputPartition`` per input file (glob over a
  directory, or a single file).  File-level parallelism is the same
  contract as Spark's own multiLine CSV / binaryFile sources: a 100 TB
  review dump arrives as many files, so the partition count tracks the
  file count; per-file parsing is pyarrow's C++ CSV reader in the quoted/
  backslash-escaped dialect the reference writes.
* **stream** — a rate-limited replay of a static file in row-range
  offsets (``rows_per_batch`` per microbatch), mirroring the reference's
  generator loop (read CSV once, push a slice per tick).  Offsets are
  plain dicts ``{"row": n}`` so checkpoint recovery replays exactly the
  uncommitted tail (at-least-once, same as the reference's producer).

The Arrow schema is derived from the declared 24-field REVIEW_SCHEMA —
`recommended` stays a *string* ("true"/"false"), normalized downstream
exactly like the batch CSV path (ref summarizer.py:33,68-70).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.csv as pacsv

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..schemas import REVIEW_CSV_COLUMNS, REVIEW_SCHEMA

__all__ = ["SteamReviewsDataSource", "register_steamreviews_source"]

_SPARK_TO_ARROW = {
    T.LongType(): pa.int64(),
    T.IntegerType(): pa.int32(),
    T.StringType(): pa.string(),
    T.DoubleType(): pa.float64(),
    T.FloatType(): pa.float32(),
    T.BooleanType(): pa.bool_(),
}

ARROW_REVIEW_SCHEMA = pa.schema(
    [(f.name, _SPARK_TO_ARROW[f.dataType]) for f in REVIEW_SCHEMA.fields]
)


def _read_file(path: str) -> pa.Table:
    """Parse one review CSV in the reference dialect (quoted, backslash-
    escaped, no header, embedded newlines legal) into the declared Arrow
    schema — C++-vectorized, no Python-per-row work."""
    table = pacsv.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=REVIEW_CSV_COLUMNS),
        parse_options=pacsv.ParseOptions(
            quote_char='"',
            escape_char="\\",
            double_quote=False,
            newlines_in_values=True,
        ),
        convert_options=pacsv.ConvertOptions(
            # Spark's CSV reader maps empty fields to NULL (its default
            # nullValue is the empty string); match it so the pluggable
            # source is row-identical to the built-in scan.
            strings_can_be_null=True,
            column_types={
                name: typ for name, typ in zip(
                    ARROW_REVIEW_SCHEMA.names, ARROW_REVIEW_SCHEMA.types
                )
            }
        ),
    )
    return table.cast(ARROW_REVIEW_SCHEMA)


_PARSE_CACHE: dict[str, tuple[float, pa.Table]] = {}


def _read_file_cached(path: str) -> pa.Table:
    """mtime-keyed parse cache (one entry per path, process-local): a
    row-range replay drains a static file through MANY range partitions,
    and re-parsing the full CSV for every range makes the drain
    O(ranges x rows).  The stream replays a *static* file by contract,
    so the cached Arrow table (zero-copy sliced per range) is exact;
    an mtime change invalidates."""
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    hit = _PARSE_CACHE.get(path)
    if hit is not None and hit[0] == mtime:
        return hit[1]
    table = _read_file(path)
    _PARSE_CACHE[path] = (mtime, table)
    return table


def _input_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.csv")))
    return sorted(glob.glob(path)) or [path]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _ReviewBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("steamreviews source requires a path")

    def partitions(self):
        return [_FilePartition(p) for p in _input_files(self.path)]

    def read(self, partition):
        table = _read_file(partition.path)
        yield from table.to_batches(max_chunksize=8192)


class _ReviewStreamReader(DataSourceStreamReader):
    """Row-range replay over a static file: ``latestOffset`` advances by
    ``rows_per_batch`` per trigger until the file is exhausted.  Planning
    state is the row count (read once on the driver side of the source);
    executors parse-and-slice their range.  A production deployment
    replays a *queue of files* with one offset per file — same reader,
    offsets keyed by file index — so state never grows with rows."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("steamreviews source requires a path")
        self.rows_per_batch = int(options.get("rows_per_batch", "10"))
        # advance_per_trigger=true: latestOffset moves one batch per
        # trigger (the reference generator's tick loop, for processingTime
        # streams).  Default (false): report EOF and let Spark split the
        # drain into row-range partitions — the deterministic availableNow
        # replay the registered query uses.
        self.advance = (
            options.get("advance_per_trigger", "false").lower() == "true"
        )
        # _read_file (uncached) on purpose: this runs driver-side and only
        # needs the row count — _read_file_cached would pin the whole
        # parsed Arrow table in driver memory for the process lifetime.
        # The cache's payoff is in read(), which runs in executor workers
        # (their own module state; in local mode the first read fills it).
        self._n_rows = _read_file(self.path).num_rows
        # Advance-mode progress lives in driver memory and resets on a
        # checkpointed RESTART; latestOffset must never regress below the
        # committed offset, or the recovered stream emits dead triggers
        # until _pos catches up.  The runner protocol never feeds any
        # offset INTO latestOffset (python_streaming_source_runner.py's
        # latest_offset_func takes no input), so an eager clamp is
        # impossible on a latestOffset-first restart path; instead:
        #   * every range boundary seen through partitions()/commit()
        #     clamps _pos forward (covers the re-run-last-batch path);
        #   * a latestOffset that arrives with NO initialOffset() call on
        #     this instance is a checkpointed restart (Spark only asks
        #     for the initial offset when its offset log is empty), and
        #     until a planned batch confirms we've caught up, the advance
        #     step DOUBLES per trigger — dead triggers drop from
        #     O(committed/rows_per_batch) to O(log) at the cost of one
        #     oversized catch-up batch, which at-least-once + the
        #     idempotent downstream merge already tolerate.
        self._pos = 0
        self._saw_initial = False
        self._saw_plan = False
        self._catchup_step = self.rows_per_batch

    def initialOffset(self):
        self._saw_initial = True
        return {"row": 0}

    def latestOffset(self):
        if self.advance:
            if self._saw_initial or self._saw_plan:
                step = self.rows_per_batch
            else:  # restart fast-forward (see __init__ comment)
                step = self._catchup_step
                self._catchup_step *= 2
            self._pos = min(self._pos + step, self._n_rows)
            return {"row": self._pos}
        return {"row": self._n_rows}

    def partitions(self, start, end):
        lo, hi = start["row"], end["row"]
        self._pos = max(self._pos, lo, hi)
        self._saw_plan = True
        self._catchup_step = self.rows_per_batch
        parts = []
        step = self.rows_per_batch
        for s in range(lo, hi, step):
            parts.append(_RangePartition(self.path, s, min(s + step, hi)))
        return parts

    def read(self, partition):
        table = _read_file_cached(partition.path)
        sliced = table.slice(partition.start, partition.end - partition.start)
        yield from sliced.to_batches(max_chunksize=8192)

    def commit(self, end):
        self._pos = max(self._pos, end["row"])
        self._saw_plan = True
        self._catchup_step = self.rows_per_batch


class _RangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class SteamReviewsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "steamreviews"

    def schema(self):
        return REVIEW_SCHEMA

    def reader(self, schema):
        return _ReviewBatchReader(self.options)

    def streamReader(self, schema):
        return _ReviewStreamReader(self.options)


def register_steamreviews_source(spark) -> None:
    """Idempotently register the format with a session (and pin the
    parity confs — pyds queries are the only ones that never route
    through ``load_table``, so they must not depend on another query
    having pinned the session first)."""
    from ..session import ensure_parity_conf

    ensure_parity_conf(spark)
    spark.dataSource.register(SteamReviewsDataSource)
