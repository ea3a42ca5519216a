"""Manifest chains: a delta commit appends ONE manifest holding only its
added entries (commit metadata O(added files), never O(bucket files) — the
quadratic-manifest-tail fix), chains self-merge at ``manifest.chain_max``,
``rewrite_manifests`` merges explicitly, and both planning paths stay
correct over chained buckets (per-bucket has_delta, conservative
stats-bounds in chain pieces)."""

import json
import os
import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import MANIFEST_DIR, LakeTable


def _mk(spark, n_buckets=2, props=None):
    root = tempfile.mkdtemp(prefix="lake_chain_")
    return LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("v", "string")],
        "url", n_buckets, props=props,
    )


def _delta(spark, t, rows, key):
    df = spark.createDataFrame(rows, "url string, lsn bigint, v string")
    return t.commit_delta(df, key)


def _manifest_bytes(t, snap, bucket):
    return sum(
        os.path.getsize(os.path.join(t.root, MANIFEST_DIR, n))
        for n in snap.manifests[str(bucket)]
    )


def _state(t):
    return {(r.url, r.lsn, r.v) for r in t.read().collect()}


def test_delta_commit_metadata_is_o_added_not_o_bucket(spark):
    """The appended manifest holds ONLY the commit's entries: its size
    stays flat as the bucket's file count grows."""
    t = _mk(spark, n_buckets=1)
    sizes = []
    for i in range(8):
        snap = _delta(spark, t, [(f"u{i}", i, "x")], f"c{i}")
        new_name = snap.manifests["0"][-1]
        entries = json.load(
            open(os.path.join(t.root, MANIFEST_DIR, new_name))
        )
        sizes.append(len(entries))
    # every appended piece records exactly this commit's files (1 here),
    # regardless of how many files the bucket already held
    assert sizes == [1] * 8, sizes
    assert len(t.current().manifests["0"]) == 8
    assert _state(t) == {(f"u{i}", i, "x") for i in range(8)}


def test_chain_merges_at_chain_max(spark):
    t = _mk(spark, n_buckets=1, props={"manifest.chain_max": 4})
    for i in range(10):
        _delta(spark, t, [(f"u{i}", i, "x")], f"c{i}")
        assert len(t.current().manifests["0"]) <= 4
    assert _state(t) == {(f"u{i}", i, "x") for i in range(10)}


def test_rewrite_manifests_merges_and_is_idempotent(spark):
    t = _mk(spark, n_buckets=1)
    for i in range(5):
        _delta(spark, t, [(f"u{i}", i, "x")], f"c{i}")
    assert len(t.current().manifests["0"]) == 5
    before = _state(t)
    snap = t.rewrite_manifests("rw1")
    assert snap.summary["op"] == "rewrite_manifests"
    assert len(t.current().manifests["0"]) == 1
    assert _state(t) == before
    # replay no-ops; nothing to merge → no empty commit
    assert t.rewrite_manifests("rw1").version == snap.version
    assert t.rewrite_manifests("rw2") is None
    # old manifests survive for old snapshots until expiry+vacuum
    assert t.read(snap=t.snapshot(snap.version - 1)).count() == 5
    t.expire_snapshots(keep_last=1)
    t.vacuum()
    assert _state(t) == before


def test_compaction_resets_chain_to_one(spark):
    t = _mk(spark, n_buckets=1)
    for i in range(5):
        _delta(spark, t, [(f"u{i}", i, "x")], f"c{i}")
    t.compact("comp")
    assert len(t.current().manifests["0"]) == 1
    kinds = {e["kind"] for e in t.bucket_entries(t.current(), 0)}
    assert kinds == {"base"}


def test_distributed_planner_collapses_chained_bucket(spark):
    """Per-bucket has_delta: a chain piece holding only base files must
    still be collapse-covered when a sibling piece carries the delta."""
    t = _mk(spark, n_buckets=1)
    # base piece: compacted single file
    _delta(spark, t, [("u1", 1, "old"), ("u2", 1, "keep")], "c0")
    t.compact("comp")
    # delta piece: newer version of u1 in a separate chain manifest
    _delta(spark, t, [("u1", 2, "new")], "c1")
    assert len(t.current().manifests["0"]) == 2
    # force the distributed planning path and compare against driver path
    got_driver = {
        (r.url, r.lsn, r.v)
        for r in t.read(distributed=False).collect()
    }
    got_spark = {
        (r.url, r.lsn, r.v)
        for r in t.read(distributed=True).collect()
    }
    want = {("u1", 2, "new"), ("u2", 1, "keep")}
    assert got_driver == want
    assert got_spark == want


def test_stats_bounds_skip_disabled_for_chain_pieces(spark):
    """A chained bucket must not stats-skip in the distributed path even
    when one piece is all-base (the winner could hide behind a loser that
    survives in the retained delta piece)."""
    t = _mk(spark, n_buckets=1)
    _delta(spark, t, [("u1", 1, "a"), ("u2", 5, "b")], "c0")
    t.compact("comp")
    _delta(spark, t, [("u1", 10, "c")], "c1")  # u1's winner, lsn outside old bounds
    # read "lsn in [1,5]": under MOR the collapse must still see the
    # delta (u1 resolves to lsn 10 → filtered out post-collapse), so the
    # correct answer is just u2
    for distributed in (False, True):
        got = {
            (r.url, r.lsn)
            for r in t.read(
                stats_bounds={"lsn": (1, 5)}, distributed=distributed
            ).collect()
            if r.lsn <= 5
        }
        assert got == {("u2", 5)}, (distributed, got)
