"""Stage GC (r7 verdict What's-wrong #3): the fingerprinted-parquet seam
mints an immutable directory per (derivation, corpus fingerprint, code
version) and nothing ever evicted old fingerprints — fine while /tmp is
ephemeral, an unbounded storage leak on a real lakehouse.  prune_stages
must remove exactly the dirs no CURRENT derivation on a LIVE corpus can
read, and nothing else.
"""

from __future__ import annotations

import os

from bigdatapipeline_steamreviews_spark.sources.staging import (
    STAGE_VERSION,
    live_fingerprints,
    prune_stages,
    source_fingerprint,
)


def _mk(root, name):
    d = os.path.join(root, name)
    os.makedirs(d)
    open(os.path.join(d, "_SUCCESS"), "w").close()
    return name


def test_prune_removes_dead_fingerprints_and_stale_versions(tmp_path):
    root = str(tmp_path)
    live_fp = "aaaa111111"
    dead_fp = "bbbb222222"
    keep_current = _mk(root, f"bands_12345678_{live_fp}_{STAGE_VERSION}")
    keep_building = _mk(root, f"sigs_{live_fp}_{STAGE_VERSION}.build999")
    gone_dead = _mk(root, f"bands_12345678_{dead_fp}_{STAGE_VERSION}")
    gone_old_version = _mk(root, f"bands_12345678_{live_fp}_v0")
    gone_dead_building = _mk(root, f"sigs_{dead_fp}_{STAGE_VERSION}.build1")

    # plain files at the root are never touched
    open(os.path.join(root, "notes.txt"), "w").close()

    removed = prune_stages({live_fp}, root=root)
    assert sorted(removed) == sorted(
        [gone_dead, gone_old_version, gone_dead_building]
    )
    assert os.path.isdir(os.path.join(root, keep_current))
    assert os.path.isdir(os.path.join(root, keep_building))
    assert os.path.exists(os.path.join(root, "notes.txt"))


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
