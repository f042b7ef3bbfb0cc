"""Round-10 ADVICE regression (medium): the `_disordered` queries filter
the stream on a null predicate BEFORE the watermark is assigned, so
Spark's final watermark derives from max(ts) over the FILTERED rows.  The
oracles' wm CTE used to take max(ts) over the UNFILTERED table — on a
corpus where the max-ts event carries a NULL value (or event_type), the
two disagree by up to the gap between the last event and the last
non-null event, and the sealed prefix diverges.  The prior sweeps passed
only because the dirty generator happened never to null the max-ts row.

This test builds exactly that corpus: the LAST event (strictly max ts,
days after everything else) has value = NULL and event_type = NULL, so
an unfiltered-max oracle seals a longer prefix than Spark ever will.
Both filtered queries must still match their oracles bitwise.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pandas as pd
import pytest

from bigdatapipeline_steamreviews_spark import REGISTRY, queries

queries()  # populate REGISTRY

_UTC = datetime.timezone.utc


@pytest.fixture(scope="module")
def null_tail_corpus(tmp_path_factory):
    """events.parquet where the strictly-latest event is null-valued.

    Non-null events cover days 0..19; the null tail sits at day 20, so
    the unfiltered span is 20 days and wm_days = floor(20/2) + 2 = 12.
    Spark's final watermark = (filtered max = day 19) - 12d = day 7: a
    nonempty sealed prefix.  An unfiltered-max oracle would use day 20 -
    12d = day 8 and seal a full extra day of events — the divergence this
    test exists to catch (asserted below)."""
    base = datetime.datetime(2024, 1, 1, tzinfo=_UTC)
    rows = []
    eid = 0
    for day in range(20):
        for k in range(6):
            eid += 1
            rows.append(
                {
                    "event_id": eid,
                    "ts": base + datetime.timedelta(days=day, minutes=137 * k),
                    "user_id": 1 + (eid % 5),
                    "event_type": ["view", "click", "purchase"][eid % 3],
                    "value": float(eid) / 7.0,
                    "props": "{}",
                }
            )
    # the strictly-max-ts event: NULL value AND NULL event_type
    eid += 1
    rows.append(
        {
            "event_id": eid,
            "ts": base + datetime.timedelta(days=20),
            "user_id": 1,
            "event_type": None,
            "value": None,
            "props": "{}",
        }
    )
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf["ts"]).dt.tz_localize(None).astype("datetime64[us]")
    d = str(tmp_path_factory.mktemp("null_tail_sf"))
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(
            tuple(
                None if v is None or (isinstance(v, float) and v != v) else v
                for v in row
            )
        )
    return sorted(out, key=repr)


@pytest.mark.parametrize(
    "name", ["stream_user_ewma_disordered", "stream_transitions_disordered"]
)
def test_filtered_wm_query_matches_oracle_when_max_ts_row_is_null(
    spark, null_tail_corpus, name
):
    spec = REGISTRY[name]
    got = _canon(spec.fn(spark, null_tail_corpus).toPandas())
    want = _canon(_oracle(null_tail_corpus, spec.oracle))
    assert len(got) > 0, "sealed prefix is empty — fixture span too short"
    assert got == want

    # Divergence-must-exist guard on the fixture: the PRE-fix oracle
    # (wm over the unfiltered max) must give a DIFFERENT answer on this
    # corpus — otherwise the fixture no longer exercises the bug.
    import re

    pat = re.compile(
        r"\(SELECT epoch_ms\(max\(ts\)\) FROM events WHERE [^)]*\)"
    )
    assert pat.search(spec.oracle), "oracle lost its filtered wm CTE"
    old_oracle = pat.sub(
        "(SELECT epoch_ms(max(ts)) FROM events)", spec.oracle
    )
    stale = _canon(_oracle(null_tail_corpus, old_oracle))
    assert stale != want, "unfiltered-max oracle agrees — fixture is inert"
