"""Shuffle-light change-feed diff: when the interval's commit ops prove
(key, lsn, tombstone) is a sufficient change fingerprint, classification
runs on three pruned columns and payload is fetched only for changed
keys; payload-rewriting ops (backfill-family) force the full struct diff
— and both strategies must produce identical feeds."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable


def _mk(spark, n_buckets=4):
    root = tempfile.mkdtemp(prefix="lake_nd_")
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


def _feed(t, v0, v1):
    return {
        (r["url"], r["op"], r["lsn"], r["v"])
        for r in t.changes_between(v0, v1).collect()
    }


def _build(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("u1", 1, TS, "a", "upsert"),
        ("u2", 2, TS, "b", "upsert"),
        ("u3", 3, TS, "c", "upsert"),
    ]), "c1")
    merge_into(t, _rows(spark, [
        ("u1", 4, TS, "a2", "upsert"),
        ("u2", 5, TS, "b", "delete"),
        ("u4", 6, TS, "d", "upsert"),
    ]), "c2")
    t.compact("k1")
    merge_into(t, _rows(spark, [
        ("u2", 7, TS, "b2", "upsert"),   # resurrect after delete
    ]), "c3")
    return t


def test_narrow_and_full_strategies_agree(spark, monkeypatch):
    t = _build(spark)
    hi = t.current().version
    intervals = [(v0, v1) for v0 in range(hi) for v1 in range(v0 + 1, hi + 1)]
    narrow = {}
    for v0, v1 in intervals:
        a, b = t.snapshot(v0), t.snapshot(v1)
        if t._diff_trusts_order(a, b):
            narrow[(v0, v1)] = _feed(t, v0, v1)
    assert narrow, "no interval took the narrow path"
    monkeypatch.setattr(
        LakeTable, "_diff_trusts_order", lambda self, a, b: False
    )
    for iv, got in narrow.items():
        assert got == _feed(t, *iv), f"strategies disagree on {iv}"


def test_payload_rewrite_at_same_lsn_forces_full_diff(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "old", "upsert"),
                                ("u2", 2, TS, "keep", "upsert")]), "c1")
    v1 = t.current().version
    # backfill-style rewrite: payload changes, lsn does not
    content = t.read(include_tombstones=True).withColumn(
        "v", F.when(F.col("url") == "u1", F.lit("patched")).otherwise(F.col("v"))
    )
    snap = t.current()
    touched = {
        int(r["b"])
        for r in content.select(t.bucket_expr(snap).alias("b")).distinct().collect()
    }
    t.commit_buckets(content, touched, "bf1")  # op="rewrite": not order-safe
    v2 = t.current().version
    assert not t._diff_trusts_order(t.snapshot(v1), t.snapshot(v2))
    assert _feed(t, v1, v2) == {("u1", "update", 1, "patched")}


def test_narrow_classification_scan_prunes_payload(spark):
    t = _build(spark)
    plan = t.read(columns=[], include_tombstones=True)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ReadSchema" in plan
    import re

    for m in re.finditer(r"ReadSchema: ([^\n]+)", plan):
        assert "v:" not in m.group(1) and "warc_ts" not in m.group(1), m.group(1)


def test_projected_read_matches_full_read(spark):
    t = _build(spark)
    got = {
        (r["url"], r["lsn"])
        for r in t.read(columns=[]).collect()
    }
    want = {
        (r["url"], r["lsn"])
        for r in t.read().select("url", "lsn").collect()
    }
    assert got == want
    # projection + column ride-along: requesting one payload col works
    got_v = {
        (r["url"], r["lsn"], r["v"]) for r in t.read(columns=["v"]).collect()
    }
    want_v = {
        (r["url"], r["lsn"], r["v"])
        for r in t.read().select("url", "lsn", "v").collect()
    }
    assert got_v == want_v
