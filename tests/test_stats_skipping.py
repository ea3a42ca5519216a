"""Manifest file-level min/max stats (Iceberg lower/upper bounds analog)
and the stats-pruned incremental read path (`read_since`): bounds are
recorded from parquet footers at commit time, skipping is sound under
LWW collapse, and a recent cursor reads O(new delta files) not O(table)."""

import json
import os
import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import MANIFEST_DIR, LakeTable
from data_pipeline_spark.pipeline import apply_batch, ensure_table, replay
from tests.conftest import SF_SMOKE


def _replayed(spark, n_batches=4):
    root = tempfile.mkdtemp(prefix="lake_stats_")
    t = ensure_table(spark, root, 8)
    replay(spark, SF_SMOKE, root, n_batches=n_batches, n_buckets=8,
           record_metrics=False)
    return t


def _n_files(t, snap, min_order=None):
    groups, _ = t._select_files(snap, None, min_order)
    return sum(len(fs) for fs in groups.values())


def test_footer_stats_recorded_and_tight(spark):
    t = _replayed(spark)
    snap = t.current()
    checked = 0
    for b in snap.manifests:
        for e in t.bucket_entries(snap, b):
            stats = e.get("stats") or {}
            assert "lsn" in stats and "warc_ts" in stats, e["path"]
            lo, hi = stats["lsn"]
            df = spark.read.parquet(os.path.join(t.root, e["path"]))
            r = df.agg(F.min("lsn"), F.max("lsn")).first()
            assert (lo, hi) == (r[0], r[1])
            checked += 1
    assert checked > 0


def test_read_since_matches_filtered_full_read(spark):
    t = _replayed(spark)
    snap = t.current()
    r = t.read().agg(F.min("lsn"), F.max("lsn")).first()
    x = (r[0] + r[1]) // 2
    got = sorted(
        (w.url, w.lsn) for w in t.read_since(x).select("url", "lsn").collect()
    )
    want = sorted(
        (w.url, w.lsn)
        for w in t.read().filter(F.col("lsn") > x).select("url", "lsn").collect()
    )
    assert got == want and got
    # and the scan consulted strictly fewer files than a full read
    assert _n_files(t, snap, x) < _n_files(t, snap)


def test_read_since_after_compaction_reads_only_new_deltas(spark):
    t = _replayed(spark, n_batches=2)
    t.compact("c0")
    snap0 = t.current()
    hi = t.read().agg(F.max("lsn")).first()[0]
    # a small late batch with strictly larger lsns
    upd = (
        t.read()
        .orderBy("url")
        .limit(5)
        .select("url", "lsn", "warc_ts", "html", "text", "lang")
        .withColumn("lsn", F.col("lsn") + 10**9)
        .withColumn("op", F.lit("update"))
    )
    urls = {r["url"] for r in upd.select("url").collect()}
    apply_batch(t, upd, "late", record_metrics=False)
    snap1 = t.current()
    n_delta = sum(
        1
        for b in snap1.manifests
        for e in t.bucket_entries(snap1, b)
        if e.get("kind") == "delta"
    )
    # cursor at pre-batch high-water: ONLY the new delta files survive
    # the stats skip (every compacted base file has max lsn <= hi)
    assert _n_files(t, snap1, hi) == n_delta
    assert _n_files(t, snap1, hi) < _n_files(t, snap1)
    got = {(r.url, r.lsn) for r in t.read_since(hi).select("url", "lsn").collect()}
    assert got == {
        (r.url, r.lsn)
        for r in t.read()
        .filter(F.col("url").isin(list(urls)))
        .select("url", "lsn")
        .collect()
    }


def test_read_since_surfaces_tombstones(spark):
    t = _replayed(spark, n_batches=2)
    hi = t.read().agg(F.max("lsn")).first()[0]
    victim = t.read().orderBy("url").limit(1)
    url = victim.first()["url"]
    dele = victim.select("url", "lsn", "warc_ts", "html", "text", "lang").withColumn(
        "lsn", F.lit(hi + 7)
    ).withColumn("op", F.lit("delete"))
    apply_batch(t, dele, "del", record_metrics=False)
    live = {r.url for r in t.read_since(hi).select("url").collect()}
    assert url not in live
    with_t = {
        r.url
        for r in t.read_since(hi, include_tombstones=True)
        .filter(F.col("__deleted"))
        .select("url")
        .collect()
    }
    assert with_t == {url}


def test_files_without_stats_are_never_skipped(spark):
    """Backward compat: manifests written before stats existed must not
    be pruned (missing bounds == cannot prune)."""
    t = _replayed(spark, n_batches=2)
    snap = t.current()
    full = _n_files(t, snap)
    # strip stats from every manifest on disk, drop the cache
    for name in {n for chain in snap.manifests.values() for n in chain}:
        p = os.path.join(t.root, MANIFEST_DIR, name)
        entries = json.load(open(p))
        for e in entries:
            e.pop("stats", None)
        json.dump(entries, open(p, "w"))
    t._manifest_cache.clear()
    hi = t.read().agg(F.max("lsn")).first()[0]
    assert _n_files(t, snap, hi) == full
