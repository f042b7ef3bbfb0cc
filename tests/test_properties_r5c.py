"""Property tests for the round-5 fourth-session operators: token-window
span dedup (interval-union coverage vs a brute-force position-set
reference) and the KMV sketch's merge property (the global sketch derived
from per-group sketches must equal the sketch of the raw union)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

K = 3  # window length for the property tests (operator default is 8)

# Documents drawn from a 4-token vocabulary so k-token windows collide
# constantly — keeper election, overlap merging, and cross-doc coverage
# all get exercised in tiny examples.
_docs = st.lists(
    st.lists(st.sampled_from("a b c d".split()), min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


def _span_dedup_reference(token_lists, k):
    """Brute-force: enumerate windows, elect (doc, pos)-lexicographic
    keepers per window text, union covered positions of non-keepers."""
    wins = {}  # text -> keeper (doc, pos)
    occs = []
    for d, toks in enumerate(token_lists):
        for i in range(len(toks) - k + 1):
            text = " ".join(toks[i : i + k])
            occs.append((d, i, text))
            if text not in wins or (d, i) < wins[text]:
                wins[text] = (d, i)
    covered = {d: set() for d in range(len(token_lists))}
    for d, i, text in occs:
        if wins[text] != (d, i):
            covered[d].update(range(i, i + k))
    return {
        d: (len(toks), len(covered[d]))
        for d, toks in enumerate(token_lists)
    }


@given(_docs)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_span_dedup_matches_bruteforce(spark, token_lists):
    from bigdatapipeline_steamreviews_spark.operators.dedup import (
        token_window_dedup,
    )

    docs = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in enumerate(token_lists)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens)
        for r in token_window_dedup(docs, k=K).collect()
    }
    want = _span_dedup_reference(token_lists, K)
    # split("") yields [""] -> n_tokens 1 for the empty doc; mirror that.
    want = {
        d: (max(n, 1), dup) for d, (n, dup) in want.items()
    }
    assert got == want


_users = st.lists(
    st.tuples(
        st.sampled_from(["click", "view"]),
        st.integers(min_value=0, max_value=40),
    ),
    min_size=1,
    max_size=60,
)


def _hash60(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)


@given(_users, st.integers(min_value=1, max_value=6))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_kmv_merge_equals_sketch_of_union(spark, rows, k):
    """k smallest of (union of per-group k-smallest sets) == k smallest
    of the raw union — the mergeability the a22 '__all__' row relies on."""
    per_group: dict[str, set] = {}
    for g, uid in rows:
        per_group.setdefault(g, set()).add(_hash60(uid))
    union_raw = sorted(set().union(*per_group.values()))[:k]
    pooled = sorted(
        set().union(*(set(sorted(s)[:k]) for s in per_group.values()))
    )[:k]
    assert pooled == union_raw


def test_kmv_exact_below_k(spark):
    """Groups under k distinct users report the exact count as estimate."""
    from bigdatapipeline_steamreviews_spark.queries_analytic import (
        a22_kmv_distinct_users,
    )

    out = {
        r.event_type: (r.n_kept, r.kmv_est)
        for r in a22_kmv_distinct_users(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    for etype, (n_kept, est) in out.items():
        if n_kept < 64:
            assert est == n_kept, f"{etype}: small-group estimate not exact"


_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=40,
)


@given(_edges)
@settings(max_examples=25, deadline=None)
def test_min_label_oracle_matches_python_components(pairs):
    """The unrolled-12 min-label SQL must label every node with its
    component minimum for any graph whose diameter fits the unroll —
    including a deliberate 12-hop chain appended to every example."""
    import duckdb

    from bigdatapipeline_steamreviews_spark.registry import _min_label_sql

    # append a 12-hop chain on fresh node ids (100..112): exactly the
    # margin boundary the helper documents
    pairs = [(a, b) for a, b in pairs if a != b] + [
        (100 + i, 101 + i) for i in range(12)
    ]
    if not pairs:
        return
    # python reference: union-find
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    con = duckdb.connect()
    con.execute(
        "CREATE TEMP TABLE p(a INT, b INT)"
    )
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    rows = con.execute(
        "WITH edges AS (SELECT a AS src, b AS dst FROM p "
        "UNION SELECT b, a FROM p),\n"
        + _min_label_sql(12)
        + "\nSELECT node, cluster_id FROM cl"
    ).fetchall()
    got = dict(rows)
    assert got == want


def _cdc_chunks_py(tokens, mask=16):
    """Pure-Python twin of x1_cdc_chunks' boundary rule."""
    import hashlib

    chunks, cur = [], []
    for tok in tokens:
        cur.append(tok)
        if int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % mask == 0:
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


@given(
    st.lists(st.sampled_from("a b c d e f g h".split()), min_size=8, max_size=40),
    st.integers(min_value=0, max_value=39),
)
@settings(max_examples=40, deadline=None)
def test_cdc_insertion_resynchronizes(tokens, pos):
    """The CDC property the docstring claims: inserting one token changes
    AT MOST the chunks up to the first boundary at/after the edit; every
    later chunk digest is identical (a fixed-stride grid would shift all
    of them).  Pure-Python check of the same boundary rule — the Spark
    implementation is hash-gated against the identical SQL."""
    pos = min(pos, len(tokens))
    edited = tokens[:pos] + ["zz"] + tokens[pos:]
    a = _cdc_chunks_py(tokens)
    b = _cdc_chunks_py(edited)
    # walk back from the ends: the common suffix must cover every chunk
    # strictly after the edited one
    i, j = len(a) - 1, len(b) - 1
    while i >= 0 and j >= 0 and a[i] == b[j]:
        i -= 1
        j -= 1
    # all divergent chunks must lie in the prefix containing the edit:
    # the token at `pos` belongs to some chunk k; chunks 0..k-1 are
    # untouched too, so divergence is a contiguous middle window of
    # length <= 2 chunks on the original side (split/merge at the edit)
    assert i - max(
        0,
        _chunk_index_of(a, pos) - 1,
    ) <= 1, (tokens, pos, a, b)


def _chunk_index_of(chunks, token_pos):
    seen = 0
    for k, ch in enumerate(chunks):
        seen += len(ch.split(" "))
        if token_pos < seen:
            return k
    return len(chunks) - 1
