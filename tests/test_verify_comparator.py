"""scripts/verify_local.py comparator tests (no Spark session).

The local gate must PREDICT the driver gate: the driver's value hash is
representation-sensitive (a DuckDB HUGEINT materializes through
``fetchdf()`` as float64 and hashes differently from Spark's int64 even
when every value is equal), so the local compare has to fail on
int-vs-float dtype-family drift instead of coercing it away — the gap
that shipped three locally-green / driver-red rows in round 5.
"""

from __future__ import annotations

import pathlib
import sys

import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

from verify_local import _num_family, compare  # noqa: E402


def test_int_vs_float_drift_fails():
    spark_df = pd.DataFrame({"k": ["a", "b"], "v": pd.array([170, 2], dtype="int64")})
    duck_df = pd.DataFrame({"k": ["a", "b"], "v": pd.array([170.0, 2.0], dtype="float64")})
    problems = compare("t", spark_df, duck_df)
    assert any("dtype-family drift" in p for p in problems), problems


def test_matching_int_frames_pass():
    df = pd.DataFrame({"k": ["a", "b"], "v": [170, 2]})
    assert compare("t", df.copy(), df.copy()) == []


def test_matching_float_frames_pass():
    df = pd.DataFrame({"k": ["a"], "v": [1.5]})
    assert compare("t", df.copy(), df.copy()) == []


def test_value_mismatch_still_fails():
    a = pd.DataFrame({"v": [1, 2]})
    b = pd.DataFrame({"v": [1, 3]})
    problems = compare("t", a, b)
    assert any("mismatched" in p for p in problems), problems


def test_object_column_of_python_ints_counts_as_int():
    # DuckDB materializes some wide-int results as object-of-int; that is
    # still the int family and must not be coerced silently against floats.
    s = pd.Series([170, 2], dtype=object)
    assert _num_family(s) == "int"
    assert _num_family(pd.Series([1.0, 2.0])) == "float"
    assert _num_family(pd.Series(["a"])) == "other"
    assert _num_family(pd.Series([True, False])) == "other"


def test_object_column_of_numpy_scalars_classified():
    # numpy scalars are not Python int/float instances; the family probe
    # must still classify them or an int-vs-float drift through an
    # object-of-np.int64 column would silently pass the gate.
    import numpy as np

    assert _num_family(pd.Series([np.int64(170), np.int64(2)], dtype=object)) == "int"
    assert _num_family(pd.Series([np.float64(1.5)], dtype=object)) == "float"
    assert _num_family(pd.Series([np.bool_(True)], dtype=object)) == "other"


def test_empty_frames_do_not_false_positive():
    a = pd.DataFrame({"v": pd.array([], dtype="int64")})
    b = pd.DataFrame({"v": pd.array([], dtype="float64")})
    # 0-row results carry no representable values to hash; only schema
    # names are compared (both sides routinely default to object/empty
    # dtypes that would false-positive a family check).
    assert compare("t", a, b) == []


def test_duck_connect_globs_directory_tables(tmp_path):
    """Round 12: the oracle gate runs on Spark-written probe corpora,
    whose tables are DIRECTORIES of part files — duck_connect must glob
    those while still reading the driver's single-FILE testdata tables
    directly."""
    import duckdb  # noqa: F401  (import guard: same env as verify_local)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from verify_local import duck_connect
    from bigdatapipeline_steamreviews_spark.sources.tables import TABLE_NAMES

    sf = tmp_path / "sf"
    sf.mkdir()
    t = pa.table({"x": [1, 2, 3]})
    for i, name in enumerate(TABLE_NAMES):
        if i % 2 == 0:  # single file, the driver-testdata layout
            pq.write_table(t, sf / f"{name}.parquet")
        else:  # directory of parts, the Spark-written layout
            d = sf / f"{name}.parquet"
            d.mkdir()
            pq.write_table(t, d / "part-00000.parquet")
            pq.write_table(t, d / "part-00001.parquet")
            (d / "_SUCCESS").touch()  # non-parquet sidecars must not break
    con = duck_connect(str(sf))
    for i, name in enumerate(TABLE_NAMES):
        n = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
        assert n == (3 if i % 2 == 0 else 6), name
