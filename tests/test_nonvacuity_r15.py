"""Non-vacuity pins for the remaining probe-keyed/self-join gates (r14
verdict ask #7): the conjunctive-search vacuity trap — a hash gate that
compares 0==0 rows and greens a broken stage — generalizes to any query
whose output cardinality depends on data structure the corpus may or
may not have.  Each test here plants that structure explicitly (in the
30x probe's word~replica salted style, so the pin covers the perturbed
corpora too) and asserts the query FINDS it, next to a sweep-level fact
recorded from the real corpora:

* `x2_containment`:  512 rows at sf0.1, 15,360 at 30x (rows_ratio 30) —
  and here a planted contained doc must surface with the exact pct;
* `x2_benchmark_contamination`: per-document LEFT-join output is never
  row-count-vacuous (one row per doc), but the HIT machinery is — its
  phrases are fixed by design (a benchmark set is external, salting it
  would be wrong), so a planted verbatim phrase must flag, and the
  all-clean corpus must report every flag false rather than lose rows;
* `j4_fuzzy_name_match`: 14,998 rows at sf0.1, 449,998 at 30x — and here
  planted distance-1 names must pair while a distance-2 name must not.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from bigdatapipeline_steamreviews_spark import queries


def _write_documents(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def test_containment_finds_planted_contained_doc_in_salted_corpus(
    spark, tmp_path
):
    """A doc whose shingles are >= 80% contained in a longer one must
    surface even when every content token carries the probe corpus's
    replica salt — containment derives everything from the corpus, no
    hardcoded key to go stale."""
    long_toks = [f"w{j}~2" for j in range(20)]
    contained = " ".join(long_toks[:10])        # shingles subset of long's
    rows = [
        (1, " ".join(long_toks), "en", "src2", 40),
        (2, contained, "en", "src2", 40),
        (3, " ".join(f"z{j}~2" for j in range(12)), "en", "src2", 40),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = {
        (r["src_id"], r["dst_id"]): r["containment_pct"]
        for r in queries()["x2_containment"](spark, sf).collect()
    }
    assert (2, 1) in out, "planted contained doc not found — vacuous gate"
    assert out[(2, 1)] == 100  # all 8 of doc 2's shingles occur in doc 1
    assert (3, 1) not in out and (3, 2) not in out


def test_benchmark_contamination_flags_planted_phrase_and_keeps_clean_rows(
    spark, tmp_path
):
    """The benchmark phrases are FIXED by design (an external eval set
    cannot be re-keyed per corpus), so the vacuity mode is silent: on a
    salted corpus every flag is false and the row count still matches.
    Pin both sides: a planted verbatim phrase must flag with the right
    hit count, and the fully-salted remainder must keep one all-false
    row per document (never lose rows)."""
    rows = [
        (1, "prologue key agg row epilogue words", "en", "s", 40),
        (2, "key agg row and stream batch big twice", "en", "s", 40),
        (3, " ".join(f"w{j}~7" for j in range(8)), "en", "s", 40),
        (4, None, "en", "s", 0),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in queries()["x2_benchmark_contamination"](spark, sf).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # one row per doc, NULL text included
    assert out[1] == (1, True)
    assert out[2] == (2, True)      # two distinct benchmark 3-grams
    assert out[3] == (0, False)     # salted doc: clean, not missing
    assert out[4] == (0, False)


def test_fuzzy_name_match_finds_planted_distance1_pairs(spark, tmp_path):
    """Planted Levenshtein-distance-1 names must pair via the deletion-
    variant blocking; a distance-2 name must not — so the gate can never
    green on a corpus whose names happen to have no near pairs (0==0)."""
    rows = [
        (1, "Customer#0001", 0, 0.0, "AUTO"),
        (2, "Customer#0002", 0, 0.0, "AUTO"),   # dist 1 of #0001
        (3, "Customer#00x2", 0, 0.0, "AUTO"),   # dist 1 of #0002, 2 of #0001
        (4, "Wholly Different", 0, 0.0, "AUTO"),
    ]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/customer.parquet"
    )
    out = {
        r["c_custkey"]: (r["n_near_dups"], r["first_match_key"])
        for r in queries()["j4_fuzzy_name_match"](spark, str(tmp_path)).collect()
    }
    assert out == {1: (1, 2), 2: (1, 3)}, out
