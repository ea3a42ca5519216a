"""Manifest key-blooms + point lookup: a bloom-enabled table's lookup
must (a) equal the filtered full read for every key, (b) open strictly
fewer files than bucket pruning alone, and (c) never false-negative —
including across deltas, tombstones, and compaction."""

import base64
import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable, _bloom_positions


def _mk(spark, n_buckets=4, bloom_bits=1024):
    root = tempfile.mkdtemp(prefix="lake_bl_")
    return LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("v", "string")],
        "url", n_buckets,
        props={"bloom_bits": bloom_bits} if bloom_bits else None,
    )


def _rows(spark, data):
    df = spark.createDataFrame(
        data, "url string, lsn bigint, warc_ts string, v string, op string"
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


TS = "2026-01-01 00:00:00"


def _fill(spark, t, n=40, batches=4):
    lsn = 0
    for b in range(batches):
        rows = []
        for i in range(b, n, batches):
            lsn += 1
            rows.append((f"u{i}", lsn, TS, f"v{b}", "upsert"))
        merge_into(t, _rows(spark, rows), f"c{b}")
    return t


def _n_files(t, **kw):
    groups, _ = t._select_files(t.current(), **kw)
    return sum(len(fs) for fs in groups.values())


def test_lookup_equals_filtered_full_read(spark):
    t = _fill(spark, _mk(spark))
    keys = ["u0", "u7", "u13", "u999"]  # incl. a missing key
    got = {(r["url"], r["lsn"], r["v"]) for r in t.lookup(keys).collect()}
    want = {
        (r["url"], r["lsn"], r["v"])
        for r in t.read().filter(F.col("url").isin(keys)).collect()
    }
    assert got == want and len(got) == 3


def test_bloom_prunes_files_beyond_buckets(spark):
    t = _fill(spark, _mk(spark))
    snap = t.current()
    key = "u5"
    b = {
        int(r["b"])
        for r in spark.createDataFrame([(key,)], "url string")
        .select(t.bucket_expr(snap).alias("b"))
        .collect()
    }
    with_bloom = _n_files(t, buckets=b, point_keys=[key])
    bucket_only = _n_files(t, buckets=b)
    # u5 appears in exactly one of the four delta files of its bucket
    assert with_bloom < bucket_only
    assert with_bloom >= 1


def test_no_false_negatives_across_all_keys(spark):
    t = _fill(spark, _mk(spark, bloom_bits=256), n=30)  # small m: FPs likely
    for i in range(30):
        rows = t.lookup([f"u{i}"]).collect()
        assert len(rows) == 1 and rows[0]["url"] == f"u{i}"


def test_tombstone_fence_rows_are_bloomed(spark):
    """A late event older than an applied delete must still lose the LWW
    race inside a point lookup — so delete-tombstone files must pass the
    bloom for the deleted key."""
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 5, TS, "a", "upsert")]), "c1")
    merge_into(t, _rows(spark, [("u1", 9, TS, "a", "delete")]), "c2")
    assert t.lookup(["u1"]).collect() == []
    fenced = t.lookup(["u1"], include_tombstones=True).collect()
    assert len(fenced) == 1 and fenced[0]["lsn"] == 9


def test_blooms_survive_compaction_and_disable_cleanly(spark):
    t = _fill(spark, _mk(spark))
    t.compact("compact-1")
    snap = t.current()
    entries = [e for es in t.all_entries(snap).values() for e in es]
    assert entries and all("bloom" in e for e in entries)
    # rebuilt (not copied): each compacted base file's bloom matches its
    # own content — every key it holds passes, bit-for-bit
    e = entries[0]
    bits = base64.b64decode(e["bloom"]["b"])
    m = e["bloom"]["m"]
    import os

    import pyarrow.parquet as pq

    urls = pq.read_table(
        os.path.join(t.root, e["path"]), columns=["url"]
    ).column(0).to_pylist()
    for u in urls:
        assert all(
            bits[p >> 3] & (1 << (p & 7)) for p in _bloom_positions(u, m)
        )
    got = {r["url"] for r in t.lookup(["u3", "u17"]).collect()}
    assert got == {"u3", "u17"}
    # opt-out table: entries carry no bloom, lookup still correct
    t2 = _fill(spark, _mk(spark, bloom_bits=0), n=8, batches=2)
    es2 = [e for es in t2.all_entries(t2.current()).values() for e in es]
    assert all("bloom" not in e for e in es2)
    assert {r["url"] for r in t2.lookup(["u3"]).collect()} == {"u3"}


def test_bloom_decodes_once_per_file_lifetime(spark, monkeypatch):
    """Planning cost: the b64 bloom payload decodes ONCE per file
    lifetime (table-level int cache), not once per scan plan — re-plans
    probe cached ints with pure AND/compare (BENCH.md planning table)."""
    import base64 as b64mod
    import tempfile

    from data_pipeline_spark.lake.merge import merge_into
    from data_pipeline_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="bloomc_"),
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("v", "string")],
        "url", 4, props={"bloom_bits": 2048},
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"u{i}", i + 1, "2026-01-01 00:00:00", f"v{i}", "upsert")
         for i in range(20)],
        "url string, lsn bigint, warc_ts string, v string, op string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    merge_into(t, df, "m0")
    t.compact("c0")
    snap = t.current()

    calls = {"n": 0}
    real = b64mod.b64decode

    def counting(x, *a, **kw):
        calls["n"] += 1
        return real(x, *a, **kw)

    monkeypatch.setattr(b64mod, "b64decode", counting)
    t._select_files(snap, None, None, ["u3"], None)
    first = calls["n"]
    assert first > 0  # cold plan decoded the blooms
    t._select_files(snap, None, None, ["u7"], None)
    t._select_files(snap, None, None, ["u3", "u9"], None)
    assert calls["n"] == first  # warm plans: zero further decodes
