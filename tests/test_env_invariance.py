"""Environment-perturbation invariance (round-9 audit, DIRTYDATA.md §9).

A fleet does not share a JVM default timezone or locale: the driver, a
1000-executor cluster, and next year's re-read of the same lake files
can all run under different `user.timezone` / `user.language`.  The
round-9 audit swept the full registry under
``TZ=Asia/Kathmandu -Duser.language=tr -Duser.country=TR
-Duser.timezone=Asia/Kathmandu`` and hash-diffed against the clean
sweep.  It found exactly one divergence — and this module pins both the
trap and the fix:

**The trap (divergence-must-exist)**: ORC ``TIMESTAMP`` has LOCAL-TIME
semantics.  The Java ORC reader reconstructs the stored wall-clock in
the READER JVM's default timezone, so a file written by a UTC fleet and
read under Asia/Kathmandu shifts every instant by -5h45m (parquet is
immune: UTC-adjusted int64).  Pinning ``user.timezone`` on the driver
only masks it in local mode — the decode happens on executors.

**The fix**: the engine ships instants through ORC as epoch-micros
integers (``sources`` stager), the same recipe as its JSON stager — an
integer column decodes identically under any JVM timezone.

The JVM-TZ flip here uses ``TimeZone.setDefault`` via the gateway — in
local mode the executors share the driver JVM, so the ORC decode path
genuinely runs under the flipped zone.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _with_jvm_tz(spark, tz_id: str):
    """Context manager: flip the JVM default timezone, restore on exit."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        TZ = spark.sparkContext._jvm.java.util.TimeZone
        saved = TZ.getDefault()
        TZ.setDefault(TZ.getTimeZone(tz_id))
        try:
            yield
        finally:
            TZ.setDefault(saved)

    return cm()


def test_orc_native_timestamp_is_reader_tz_dependent(spark, tmp_path):
    """Divergence-must-exist: if this fails, Spark's ORC reader became
    reader-TZ-independent and the engine's epoch-integer detour (and this
    audit's finding) should be revisited."""
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts").limit(200)
    path = str(tmp_path / "native_ts.orc")
    ev.write.mode("overwrite").orc(path)
    utc_read = spark.read.orc(path).select("event_id", "ts").toPandas()
    with _with_jvm_tz(spark, "Asia/Kathmandu"):
        ktm_read = spark.read.orc(path).select("event_id", "ts").toPandas()
    a = utc_read.sort_values("event_id", ignore_index=True)
    b = ktm_read.sort_values("event_id", ignore_index=True)
    deltas = (b["ts"] - a["ts"]).dt.total_seconds().unique().tolist()
    assert deltas == [-20700.0], (
        f"expected the -5h45m reader-TZ shift, got deltas={deltas[:5]} — "
        "ORC TIMESTAMP semantics changed; revisit the epoch-integer detour"
    )


def test_engine_orc_staging_is_reader_tz_invariant(spark):
    """The fix: the engine's ORC stage (epoch-micros integers) decodes to
    the same instants under a hostile reader JVM timezone, so
    src_orc_daily_summary answers identically on any fleet."""
    from bigdatapipeline_steamreviews_spark.queries_sources import (
        _stage_events_as,
    )

    path = _stage_events_as(spark, SF_DIR, "orc")

    def read():
        return (
            spark.read.orc(path)
            .withColumn("ts", F.timestamp_micros(F.col("ts")))
            .select("event_id", "ts")
            .toPandas()
            .sort_values("event_id", ignore_index=True)
        )

    utc_read = read()
    with _with_jvm_tz(spark, "Asia/Kathmandu"):
        ktm_read = read()
    assert utc_read["ts"].equals(ktm_read["ts"])
    # And the decoded instants equal the parquet source exactly.
    src = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "ts")
        .toPandas()
        .sort_values("event_id", ignore_index=True)
    )
    assert utc_read["ts"].equals(src["ts"])
