"""Partition evolution via linear-hashing bucket splits: state-preserving,
O(split bucket) cost, correct routing of later merges, split-aware
compaction, and idempotency."""

import os
import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.pipeline import apply_batch, ensure_table, replay
from tests.conftest import SF_SMOKE


def _state(table):
    return sorted(
        (r.url, r.lsn, r.h)
        for r in table.read()
        .selectExpr("url", "lsn", "sha2(text, 256) AS h")
        .collect()
    )


def _replayed(spark, n_buckets=8):
    root = tempfile.mkdtemp(prefix="lake_split_")
    t = ensure_table(spark, root, n_buckets)
    replay(spark, SF_SMOKE, root, n_batches=2, n_buckets=n_buckets,
           record_metrics=False)
    t.compact("c0")
    return t


def _hottest_base(t):
    snap = t.current()
    counts = (
        t.read()
        .groupBy(F.pmod(F.xxhash64(snap.key), F.lit(snap.n_buckets)).alias("b"))
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    return int(counts["b"])


def test_split_preserves_state_and_costs_one_bucket(spark):
    t = _replayed(spark)
    before = _state(t)
    snap0 = t.current()
    hot = _hottest_base(t)
    untouched = {
        b: m for b, m in snap0.manifests.items() if int(b) != hot and m
    }

    s1 = t.split_bucket(hot, "split-1")
    assert s1.depths == {str(hot): 1}
    # the split rewrote ONLY the hot base's manifests; every other bucket
    # carries forward by reference (same manifest file names)
    for b, m in untouched.items():
        assert s1.manifests[b] == m
    # the two sub-buckets partition the hot bucket's keys
    sub = set(t.sub_buckets(s1, hot))
    assert sub == {hot, hot + snap0.n_buckets}
    assert _state(t) == before

    # split again → depth 2, four sub-buckets, state still identical
    s2 = t.split_bucket(hot, "split-2")
    assert s2.depths == {str(hot): 2}
    assert len(t.sub_buckets(s2, hot)) == 4
    assert _state(t) == before


def test_split_routing_of_later_merges(spark):
    """After a split, a new delta for a key in the split base must land in
    the key's finer sub-bucket — and a key-pruned read of just that
    sub-bucket must see it."""
    t = _replayed(spark)
    hot = _hottest_base(t)
    t.split_bucket(hot, "split-1")
    snap = t.current()

    # pick a key whose base bucket is the split one
    row = (
        t.read()
        .filter(
            F.pmod(F.xxhash64(snap.key), F.lit(snap.n_buckets)) == hot
        )
        .select("url", "lsn", "warc_ts", "html", "text", "lang")
        .limit(1)
    )
    upd = row.withColumn("lsn", F.col("lsn") + 10**9).withColumn(
        "op", F.lit("update")
    )
    url = row.first()["url"]
    apply_batch(t, upd, "post-split-merge", record_metrics=False)

    snap2 = t.current()
    touched = snap2.summary["touched"]
    fine = [
        r[0]
        for r in upd.select(t.bucket_expr(snap2).alias("b")).collect()
    ]
    assert touched == sorted(set(fine))
    # key-pruned read: only the key's sub-bucket manifest is consulted
    got = t.read(buckets=set(fine)).filter(F.col("url") == url).first()
    assert got["lsn"] == row.first()["lsn"] + 10**9


def test_split_then_compact_keeps_state(spark):
    t = _replayed(spark)
    before = _state(t)
    hot = _hottest_base(t)
    t.split_bucket(hot, "split-1")
    # land a delta everywhere, then compact the whole (split-aware) table
    upd = (
        t.read()
        .limit(20)
        .select("url", "lsn", "warc_ts", "html", "text", "lang")
        .withColumn("lsn", F.col("lsn") + 10**9)
        .withColumn("op", F.lit("update"))
    )
    expected_urls = {r["url"] for r in upd.select("url").collect()}
    apply_batch(t, upd, "post-split-delta", record_metrics=False)
    t.compact("c-after-split")
    after = {r[0]: r[1] for r in ((u, l) for u, l, _ in _state(t))}
    for u, l, _ in before:
        if u in expected_urls:
            assert after[u] == l + 10**9
        else:
            assert after[u] == l


def test_split_is_idempotent_by_commit_key(spark):
    t = _replayed(spark)
    hot = _hottest_base(t)
    s1 = t.split_bucket(hot, "split-x")
    v = s1.version
    s2 = t.split_bucket(hot, "split-x")  # replay of the same commit
    assert s2.version == v
    assert s2.depths == {str(hot): 1}


def test_auto_split_targets_only_oversized_buckets(spark):
    from data_pipeline_spark.maintenance import auto_split

    t = _replayed(spark)
    snap = t.current()
    sizes = {
        int(b): sum(e.get("bytes") or 0 for e in t.bucket_entries(snap, b))
        for b in snap.manifests
        if t.bucket_entries(snap, b)
    }
    ranked = sorted(sizes, key=lambda b: -sizes[b])
    # threshold chosen so exactly the two largest buckets qualify
    thresh = sizes[ranked[2]]
    before = _state(t)
    split = auto_split(t, "as-1", max_bucket_bytes=thresh)
    assert set(split) == set(ranked[:2])
    assert t.current().depths == {str(b): 1 for b in ranked[:2]}
    assert _state(t) == before
    # replaying the same round is a no-op (same per-base commit keys)
    v = t.current().version
    assert set(auto_split(t, "as-1", max_bucket_bytes=thresh)) == set(ranked[:2])
    assert t.current().version == v
    # sub-bucket bytes now count toward the BASE id: a finer threshold
    # uses post-split sizes, and max_splits bounds the round
    split2 = auto_split(t, "as-2", max_bucket_bytes=0, max_splits=1)
    assert len(split2) == 1
