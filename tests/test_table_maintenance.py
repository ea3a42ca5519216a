"""Time travel, incremental change reads, snapshot expiry + vacuum."""

import os
import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable


def _mk(spark):
    root = tempfile.mkdtemp(prefix="lake_tm_")
    t = LakeTable.create(
        spark, root, [("url", "string"), ("lsn", "bigint"), ("v", "string")],
        "url", 4,
    )
    return t


def _rows(spark, data):
    return spark.createDataFrame(data, "url string, lsn bigint, v string, op string")


def test_time_travel(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("a", 1, "a1", "insert"), ("b", 2, "b1", "insert")]), "c1")
    v1 = t.current().version
    merge_into(t, _rows(spark, [("a", 3, "a2", "update"), ("b", 4, None, "delete")]), "c2")
    now = {(r.url, r.v) for r in t.read().collect()}
    assert now == {("a", "a2")}
    past = {(r.url, r.v) for r in t.read_version(v1).collect()}
    assert past == {("a", "a1"), ("b", "b1")}


def test_changes_between(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("a", 1, "a1", "insert"), ("b", 2, "b1", "insert"),
                                ("c", 3, "c1", "insert")]), "c1")
    v1 = t.current().version
    merge_into(t, _rows(spark, [("a", 4, "a2", "update"),      # update
                                ("b", 5, None, "delete"),       # delete
                                ("d", 6, "d1", "insert")]), "c2")  # insert
    v2 = t.current().version
    changes = {
        (r.url, r.op, r.v) for r in t.changes_between(v1, v2).collect()
    }
    assert changes == {
        ("a", "update", "a2"),
        ("b", "delete", "b1"),
        ("d", "insert", "d1"),
    }
    # c unchanged -> not in the feed; empty diff for identical versions
    assert t.changes_between(v2, v2).count() == 0


def test_expire_snapshots_and_vacuum(spark):
    t = _mk(spark)
    for i in range(4):
        merge_into(t, _rows(spark, [("a", i + 1, f"a{i}", "update")]), f"c{i}")
    # merge-on-read: every delta file is still referenced by the current
    # snapshot, so nothing is reclaimable yet
    t.expire_snapshots(keep_last=1)
    assert t.vacuum() == 0
    n_files_before = len([p for p in _walk_parquet(t.root)])
    # compaction supersedes the deltas; expiring the pre-compaction
    # snapshots releases them for vacuum
    t.compact("compact-1")
    expired = t.expire_snapshots(keep_last=1)
    assert len(expired) >= 1
    removed = t.vacuum()
    assert removed > 0
    # current state still fully readable
    assert {(r.url, r.v) for r in t.read().collect()} == {("a", "a3")}
    n_files_after = len([p for p in _walk_parquet(t.root)])
    assert n_files_after < n_files_before
    # expire is conservative: current snapshot always survives
    assert t.current().version == 5


def _walk_parquet(root):
    for dirpath, _d, files in os.walk(os.path.join(root, "data")):
        for fn in files:
            if fn.endswith(".parquet"):
                yield os.path.join(dirpath, fn)


def test_changes_between_on_replayed_log(spark):
    """Change feed between mid-log and end-of-log matches the
    cdc_state_diff classification (new/changed urls appear, unchanged
    don't)."""
    from data_pipeline_spark import changelog as cl
    from data_pipeline_spark.pipeline import apply_batch, ensure_table
    from tests.conftest import SF_SMOKE

    log = cl.changelog(spark, SF_SMOKE)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    mid = lo + (hi - lo) // 2
    root = tempfile.mkdtemp()
    t = ensure_table(spark, root, 8)
    apply_batch(t, log.filter(F.col("lsn") <= mid), "b0", record_metrics=False)
    v1 = t.current().version
    apply_batch(t, log.filter(F.col("lsn") > mid), "b1", record_metrics=False)
    v2 = t.current().version

    feed = t.changes_between(v1, v2)
    ops = {r.url: r.op for r in feed.select("url", "op").collect()}
    # every url in the feed really differs between the two states
    old = {r.url: r.lsn for r in t.read_version(v1).select("url", "lsn").collect()}
    new = {r.url: r.lsn for r in t.read_version(v2).select("url", "lsn").collect()}
    for url, op in ops.items():
        if op == "insert":
            assert url in new and url not in old
        elif op == "delete":
            assert url in old and url not in new
        else:
            assert old[url] != new[url]
    # completeness: any url whose lsn changed is in the feed
    for url in set(old) | set(new):
        if old.get(url) != new.get(url):
            assert url in ops, url
