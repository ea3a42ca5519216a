"""Predicate deletes: DELETE WHERE as an O(matching) delta commit with
high-watermark tombstone fences — already-seen events lose, genuinely
newer events resurrect."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.maintenance import delete_where


def _mk(spark, n_buckets=8):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_dw_"),
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("lang", "string")],
        "url", n_buckets,
    )


def _rows(spark, data):
    df = spark.createDataFrame(
        data, "url string, lsn bigint, warc_ts string, lang string, op string"
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


TS = "2026-01-01 00:00:00"


def _langs(t):
    return {(r["url"], r["lang"]) for r in t.read().collect()}


def test_delete_where_fence_semantics(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("u1", 1, TS, "de", "upsert"),
        ("u2", 2, TS, "en", "upsert"),
        ("u3", 3, TS, "de", "upsert"),
    ]), "c1")
    stats = delete_where(t, F.col("lang") == "de", "dw1")
    assert stats.applied
    assert _langs(t) == {("u2", "en")}
    # idempotent on commit key
    assert not delete_where(t, F.col("lang") == "en", "dw1").applied
    assert _langs(t) == {("u2", "en")}
    # a LATE event already below the fence (lsn 3 < fence 4) stays dead
    merge_into(t, _rows(spark, [("u1", 3, TS, "de", "upsert")]), "c2")
    assert _langs(t) == {("u2", "en")}
    # a genuinely newer event (above the fence) resurrects the key
    merge_into(t, _rows(spark, [("u3", 9, TS, "fr", "upsert")]), "c3")
    assert _langs(t) == {("u2", "en"), ("u3", "fr")}


def test_delete_where_writes_o_matching(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        (f"u{i}", i + 1, TS, "en" if i else "de", "upsert")
        for i in range(32)
    ]), "c1")
    before = dict(t.current().manifests)
    delete_where(t, F.col("lang") == "de", "dw1")  # matches only u0
    after = t.current().manifests
    changed = {b for b in after if before.get(b) != after[b]}
    assert len(changed) == 1  # only u0's bucket appended a delta
    assert ("u0", "de") not in _langs(t) and len(_langs(t)) == 31


def test_tombstones_are_narrow(spark):
    """Committed tombstones carry NO payload — only (key, lsn fence,
    warc_ts age-out fence): the Iceberg-equality-delete cost shape, and
    what forget()'s privacy claim relies on (a delete must not
    re-serialize the content it removes). Before-images in the change
    feed come from the PRIOR snapshot, never from tombstone payload."""
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("u1", 1, TS, "de", "upsert"),
        ("u2", 2, TS, "en", "upsert"),
        ("u3", 3, TS, "de", "upsert"),
    ]), "c1")
    v0 = t.current().version
    delete_where(t, F.col("lang") == "de", "dw1")
    raw = t.read(raw=True).filter(F.col("__deleted")).collect()
    assert {r["url"] for r in raw} == {"u1", "u3"}
    # payload nulled; both fences retained (warc_ts ages the tombstone
    # out through retention — a NULL there would never expire)
    assert all(r["lang"] is None for r in raw)
    assert all(r["warc_ts"] is not None for r in raw)
    assert all(r["lsn"] == 4 for r in raw)
    # change feed still shows full delete before-images
    ch = {
        (r["url"], r["op"], r["lang"])
        for r in t.changes_between(v0, t.current().version).collect()
    }
    assert ch == {("u1", "delete", "de"), ("u3", "delete", "de")}


def test_delete_commit_bytes_independent_of_row_width(spark):
    """A predicate delete over a wide-payload table commits O(matching ×
    tens of bytes), not O(matching × row width): 64 rows × 20 kB payload
    must tombstone in well under a tenth of the payload volume."""
    import os

    t = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_dwn_"),
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("body", "string"), ("lang", "string")],
        "url", 4,
    )
    big = "x" * 20000
    df = spark.createDataFrame(
        [(f"u{i}", i + 1, TS, big, "de") for i in range(64)],
        "url string, lsn bigint, warc_ts string, body string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")) \
     .withColumn("op", F.lit("upsert"))
    merge_into(t, df, "c1")
    t.compact("k1", min_files=1)
    delete_where(t, F.col("lang") == "de", "dw1")
    snap = t.current()
    delta = sum(
        os.path.getsize(os.path.join(t.root, e["path"]))
        for b in snap.manifests
        for e in t.bucket_entries(snap, b)
        if e.get("kind", "base") == "delta"
    )
    assert t.read().count() == 0
    assert delta * 10 < 64 * 20000  # < 128 kB for 1.28 MB of payload


def test_delete_where_empty_table_and_no_match(spark):
    t = _mk(spark)
    assert not delete_where(t, F.col("lang") == "xx", "dw0").applied
    merge_into(t, _rows(spark, [("u1", 1, TS, "en", "upsert")]), "c1")
    delete_where(t, F.col("lang") == "xx", "dw1")
    assert _langs(t) == {("u1", "en")}
