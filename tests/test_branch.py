"""Branches: multi-commit isolation, fast-forward publish, divergence
refusal, vacuum safety for live branches, and reclamation of abandoned
ones."""

import tempfile

import pytest

from pyspark.sql import functions as F

from data_pipeline_spark.lake.branch import (
    BranchDivergedError,
    branch_handle,
    create_branch,
    delete_branch,
    list_branches,
    publish_branch,
)
from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.pipeline import ensure_table


def _batch(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, lsn bigint, warc_ts string, html binary, "
        "lang string, op string"
    )
    return df.select(
        "url", "lsn", F.to_timestamp("warc_ts").alias("warc_ts"), "html",
        F.lit(None).cast("string").alias("text"), "lang", "op",
    )


def _mk(spark):
    t = ensure_table(spark, tempfile.mkdtemp(prefix="br_"), 4)
    merge_into(t, _batch(spark, [
        ("u1", 1, "2024-01-01 00:00:00", b"a", "en", "insert"),
        ("u2", 2, "2024-01-01 00:00:00", b"b", "de", "insert"),
    ]), "m0")
    return t


def _state(handle):
    return sorted((r.url, r.lsn) for r in handle.read().collect())


def test_branch_commits_invisible_then_fast_forward(spark):
    t = _mk(spark)
    main_before = _state(t)
    br = create_branch(t, "audit")
    merge_into(br, _batch(spark, [
        ("u3", 3, "2024-01-02 00:00:00", b"c", "fr", "insert"),
    ]), "b0")
    merge_into(br, _batch(spark, [
        ("u1", 4, "2024-01-03 00:00:00", b"a2", "en", "update"),
        ("u2", 5, "2024-01-03 00:00:00", None, "de", "delete"),
    ]), "b1")
    # two commits on the branch, none visible on main
    assert _state(t) == main_before
    assert _state(br) == [("u1", 4), ("u3", 3)]
    assert list_branches(t) == ["audit"]

    head = publish_branch(t, "audit")
    assert _state(t) == [("u1", 4), ("u3", 3)]
    assert t.current().version == head.version
    assert list_branches(t) == []
    # branch commit keys rode into main: replays stay exactly-once
    assert t.is_committed("b0") and t.is_committed("b1")


def test_diverged_main_refuses_publish(spark):
    t = _mk(spark)
    br = create_branch(t, "audit")
    merge_into(br, _batch(spark, [
        ("u3", 3, "2024-01-02 00:00:00", b"c", "fr", "insert"),
    ]), "b0")
    merge_into(t, _batch(spark, [
        ("u4", 4, "2024-01-02 00:00:00", b"d", "es", "insert"),
    ]), "m1")
    with pytest.raises(BranchDivergedError):
        publish_branch(t, "audit")
    # branch state is still intact for inspection / rebuild
    assert ("u3", 3) in _state(branch_handle(t, "audit"))


def test_vacuum_spares_live_branch_then_reclaims_abandoned(spark):
    t = _mk(spark)
    br = create_branch(t, "wip")
    merge_into(br, _batch(spark, [
        ("u3", 3, "2024-01-02 00:00:00", b"c", "fr", "insert"),
    ]), "b0")
    assert t.vacuum() == 0  # live branch files are roots
    assert _state(br) == [("u1", 1), ("u2", 2), ("u3", 3)]
    delete_branch(t, "wip")
    assert t.vacuum() > 0  # abandoned branch data reclaimed
    # main unaffected
    assert _state(t) == [("u1", 1), ("u2", 2)]


def test_branch_compaction_publishes(spark):
    t = _mk(spark)
    br = create_branch(t, "opt")
    merge_into(br, _batch(spark, [
        ("u3", 3, "2024-01-02 00:00:00", b"c", "fr", "insert"),
    ]), "b0")
    br.compact("b-compact")
    publish_branch(t, "opt")
    assert _state(t) == [("u1", 1), ("u2", 2), ("u3", 3)]
    # post-publish maintenance on main still works over promoted history
    t.vacuum()
    assert _state(t) == [("u1", 1), ("u2", 2), ("u3", 3)]


def test_empty_branch_publish_is_noop_and_refork_allowed(spark):
    t = _mk(spark)
    create_branch(t, "idle")
    v = t.current().version
    publish_branch(t, "idle")
    assert t.current().version == v
    create_branch(t, "idle")  # name reusable after drop
    delete_branch(t, "idle")


def test_disjoint_rebase_publish_merges_both_lines(spark):
    t = _mk(spark)  # u1 (bucket of u1), u2
    br = create_branch(t, "feat")
    # find urls landing in DIFFERENT buckets so the lines stay disjoint
    snap = t.current()
    probe = spark.createDataFrame(
        [(f"k{i}",) for i in range(40)], "url string"
    ).select("url", t.bucket_expr(snap, "url").alias("b"))
    by_bucket = {}
    for r in probe.collect():
        by_bucket.setdefault(r.b, r.url)
    buckets = sorted(by_bucket)
    assert len(buckets) >= 2
    u_branch, u_main = by_bucket[buckets[0]], by_bucket[buckets[1]]

    merge_into(br, _batch(spark, [
        (u_branch, 100, "2024-01-02 00:00:00", b"c", "fr", "insert"),
    ]), "b0")
    merge_into(t, _batch(spark, [
        (u_main, 101, "2024-01-02 00:00:00", b"d", "es", "insert"),
    ]), "m1")

    with pytest.raises(BranchDivergedError):
        publish_branch(t, "feat")  # plain publish still refuses
    new = publish_branch(t, "feat", rebase=True)
    state = _state(t)
    assert (u_branch, 100) in state and (u_main, 101) in state
    assert t.is_committed("b0") and t.is_committed("m1")
    assert new.summary["rebased_branch"] == "feat"


def test_rebase_refuses_overlapping_buckets(spark):
    t = _mk(spark)
    br = create_branch(t, "feat")
    row = ("u1", 100, "2024-01-02 00:00:00", b"c", "fr", "update")
    merge_into(br, _batch(spark, [row]), "b0")
    merge_into(t, _batch(spark, [
        ("u1", 101, "2024-01-02 00:00:00", b"d", "es", "update"),
    ]), "m1")
    with pytest.raises(BranchDivergedError, match="touched buckets"):
        publish_branch(t, "feat", rebase=True)


def test_rebase_refuses_schema_change(spark):
    t = _mk(spark)
    br = create_branch(t, "feat")
    merge_into(br, _batch(spark, [
        ("u9", 100, "2024-01-02 00:00:00", b"c", "fr", "insert"),
    ]), "b0")
    t.evolve_schema(add_columns={"score": "bigint"})
    with pytest.raises(BranchDivergedError, match="schema or bucket"):
        publish_branch(t, "feat", rebase=True)


def test_publish_never_overwrites_a_raced_main_snapshot(spark):
    """A main-line writer that commits between publish's current() read
    and its snapshot-copy loop must surface as a loud BranchDivergedError
    with main's freshly-committed snapshot file byte-intact — never a
    silent overwrite (the copy uses O_EXCL create-or-fail)."""
    import os

    from data_pipeline_spark.lake.table import SNAPSHOT_DIR

    t = _mk(spark)
    br = create_branch(t, "racer")
    merge_into(br, _batch(spark, [
        ("u9", 9, "2024-01-02 00:00:00", b"x", "en", "insert"),
    ]), "b0")
    head = br.current().version
    # Simulate the racing main commit landing at the same fixed name the
    # promote loop writes first (fork+1 == branch's first promoted v).
    raced = os.path.join(t.root, SNAPSHOT_DIR, f"v{head:08d}.json")
    racer_content = '{"racer": "main-line commit, must survive"}'
    with open(raced, "w") as f:
        f.write(racer_content)
    with pytest.raises(BranchDivergedError, match="committed"):
        publish_branch(t, "racer")
    with open(raced) as f:
        assert f.read() == racer_content  # byte-intact, not overwritten
