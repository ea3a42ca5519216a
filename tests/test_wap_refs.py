"""Write-audit-publish staged commits, immutable tags, and metadata-only
rollback: staged merges are invisible until published, aborted stages are
vacuum-reclaimed, tags pin snapshots through expiry, rollback reverts
state while keeping history (and feeds one reverting diff downstream)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import (
    DATA_DIR,
    ConcurrentCommitError,
    LakeTable,
)


def _mk(spark, n_buckets=4):
    root = tempfile.mkdtemp(prefix="lake_wap_")
    return LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("v", "string")],
        "url", n_buckets,
    )


def _rows(spark, data):
    df = spark.createDataFrame(
        data, "url string, lsn bigint, warc_ts string, v string, op string"
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


TS = "2026-01-01 00:00:00"


def _state(t, **kw):
    return {(r["url"], r["lsn"], r["v"]) for r in t.read(**kw).collect()}


def test_stage_audit_publish(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "upsert")]), "c1")
    st = merge_into(
        t, _rows(spark, [("u2", 2, TS, "b", "upsert")]), "c2",
        stage_id="wap-1",
    )
    # invisible to readers until published
    assert _state(t) == {("u1", 1, "a")}
    # the audit view reads the staged snapshot directly
    staged = t.staged_snapshots()["wap-1"]
    assert staged.version == st.version
    assert _state(t, snap=staged) == {("u1", 1, "a"), ("u2", 2, "b")}
    pub = t.publish_staged("wap-1")
    assert t.current().version == pub.version
    assert _state(t) == {("u1", 1, "a"), ("u2", 2, "b")}
    assert t.staged_snapshots() == {}
    # the published commit key is now deduped like any other
    merge_into(t, _rows(spark, [("u9", 9, TS, "x", "upsert")]), "c2")
    assert _state(t) == {("u1", 1, "a"), ("u2", 2, "b")}


def test_abort_reclaims_staged_files(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "upsert")]), "c1")
    merge_into(
        t, _rows(spark, [("u2", 2, TS, "BAD", "upsert")]), "c2",
        stage_id="wap-bad",
    )
    staged_dir = os.path.join(t.root, DATA_DIR, "staged-wap-bad")
    assert os.path.isdir(staged_dir)
    # pending stage survives vacuum (audit window may outlast maintenance)
    assert t.vacuum() == 0
    t.abort_staged("wap-bad")
    assert t.vacuum() > 0
    leftover = [
        fn
        for _, _, fns in os.walk(staged_dir)
        for fn in fns
        if fn.endswith(".parquet")
    ]
    assert leftover == []  # only _SUCCESS markers may remain
    assert _state(t) == {("u1", 1, "a")}
    # the aborted key was never committed — a clean retry applies
    merge_into(t, _rows(spark, [("u2", 2, TS, "good", "upsert")]), "c2")
    assert _state(t) == {("u1", 1, "a"), ("u2", 2, "good")}


def test_publish_refuses_stale_stage(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "upsert")]), "c1")
    merge_into(
        t, _rows(spark, [("u2", 2, TS, "b", "upsert")]), "c2",
        stage_id="wap-1",
    )
    # main line advances while the audit runs
    merge_into(t, _rows(spark, [("u3", 3, TS, "c", "upsert")]), "c3")
    with pytest.raises(ConcurrentCommitError):
        t.publish_staged("wap-1")
    # restage on the new head and publish cleanly
    t.abort_staged("wap-1")
    merge_into(
        t, _rows(spark, [("u2", 2, TS, "b", "upsert")]), "c2",
        stage_id="wap-2",
    )
    t.publish_staged("wap-2")
    assert _state(t) == {("u1", 1, "a"), ("u2", 2, "b"), ("u3", 3, "c")}


def test_stage_is_idempotent(spark):
    t = _mk(spark)
    s1 = merge_into(
        t, _rows(spark, [("u1", 1, TS, "a", "upsert")]), "c1",
        stage_id="wap-1",
    )
    s2 = merge_into(
        t, _rows(spark, [("u1", 1, TS, "DIFFERENT", "upsert")]), "c1",
        stage_id="wap-1",
    )
    assert s1.version == s2.version
    t.publish_staged("wap-1")
    assert _state(t) == {("u1", 1, "a")}


def test_tags_pin_through_expiry(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "upsert")]), "c1")
    v_good = t.tag("last-known-good")
    merge_into(t, _rows(spark, [("u1", 2, TS, "b", "upsert")]), "c2")
    merge_into(t, _rows(spark, [("u1", 3, TS, "c", "upsert")]), "c3")
    expired = t.expire_snapshots(keep_last=1)
    assert v_good not in expired
    t.vacuum()
    assert {(r["url"], r["v"]) for r in t.read_tag("last-known-good").collect()} \
        == {("u1", "a")}
    # immutable: moving the tag is an error; re-pinning same version is not
    t.tag("last-known-good", v_good)
    with pytest.raises(ValueError):
        t.tag("last-known-good", t.current().version)
    # dangling tags are rejected at create time
    with pytest.raises(FileNotFoundError):
        t.tag("nope", 999)


def test_rollback_restores_state_and_feeds_reverting_diff(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "upsert"),
                                ("u2", 2, TS, "b", "upsert")]), "c1")
    v1 = t.current().version
    merge_into(t, _rows(spark, [("u1", 3, TS, "BAD", "upsert"),
                                ("u3", 4, TS, "BAD", "upsert")]), "c2")
    v2 = t.current().version
    rb = t.rollback_to(v1, "rollback-1")
    assert _state(t) == {("u1", 1, "a"), ("u2", 2, "b")}
    # history intact: the bad head still readable by version
    assert ("u3", 4, "BAD") in _state(t, snap=t.snapshot(v2))
    # downstream feed sees one reverting diff
    ops = {
        (r["url"], r["op"])
        for r in t.changes_between(v2, rb.version).collect()
    }
    assert ops == {("u1", "update"), ("u3", "delete")}
    # idempotent on commit key
    assert t.rollback_to(v1, "rollback-1").version == rb.version
