"""Distributed scan planning: the manifest filter (min_order / bloom /
stats skipping) running as a Spark job must return exactly the driver
loop's answer — same retained files, same delta-bucket set — on a table
mixing compacted buckets, delta tails, tombstones, and schema versions;
and the auto-route must engage by selected-manifest byte size."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable


def _mk(spark, n_buckets=4):
    root = tempfile.mkdtemp(prefix="lake_plan_")
    return LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("v", "string")],
        "url", n_buckets,
        props={"bloom_bits": 256},
    )


def _rows(spark, data):
    df = spark.createDataFrame(
        data, "url string, lsn bigint, warc_ts string, v string, op string"
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _mixed_table(spark):
    """Base files + compaction + a delta tail + a tombstone + evolution:
    every skip rule has files on both sides of its decision."""
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        (f"u{i}", i, f"2024-01-{(i % 27) + 1:02d} 00:00:00", f"v{i}",
         "insert")
        for i in range(40)
    ]), "m0")
    t.compact("c0")  # all-base everywhere
    merge_into(t, _rows(spark, [
        ("u1", 100, "2024-02-01 00:00:00", "v1b", "update"),
        ("u2", 101, "2024-02-02 00:00:00", None, "delete"),
    ]), "m1")  # delta tail in u1/u2's buckets only
    t.evolve_schema(add_columns={"score": "double"}, commit_key="s1")
    merge_into(t, spark.createDataFrame(
        [("u3", 200, "2024-03-01 00:00:00", "v3b", 0.5, "update")],
        "url string, lsn bigint, warc_ts string, v string, score double,"
        " op string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")), "m2")
    return t


def _norm(plan):
    groups, deltas = plan
    return {sv: sorted(fs) for sv, fs in groups.items()}, set(deltas)


def test_distributed_plan_equals_driver_plan(spark):
    t = _mixed_table(spark)
    snap = t.current()
    cases = [
        dict(),                                       # full scan
        dict(buckets={0, 1}),                         # bucket-pruned
        dict(min_order=50),                           # incremental cursor
        dict(point_keys=["u1", "u7", "missing"]),     # bloom probe
        dict(stats_bounds={"lsn": (0, 10)}),          # stats skip
        dict(min_order=50, point_keys=["u1"]),        # combined
    ]
    for kw in cases:
        buckets = kw.pop("buckets", None)
        drv = t._select_files(snap, buckets, distributed=False, **kw)
        dst = t._select_files(snap, buckets, distributed=True, **kw)
        assert _norm(drv) == _norm(dst), kw


def test_distributed_read_matches_driver_read(spark, monkeypatch):
    t = _mixed_table(spark)
    want = sorted(
        (r.url, r.lsn, r.v) for r in t.read().select("url", "lsn", "v")
        .collect()
    )
    # force every plan through the Spark job
    monkeypatch.setattr(LakeTable, "PLAN_DISTRIBUTED_MIN_BYTES", 0)
    got = sorted(
        (r.url, r.lsn, r.v) for r in t.read().select("url", "lsn", "v")
        .collect()
    )
    assert got == want
    assert len(got) == 39  # 40 inserts - 1 delete


def test_auto_route_engages_by_manifest_bytes(spark, monkeypatch):
    t = _mixed_table(spark)
    calls = {"spark": 0}
    orig = LakeTable._select_files_spark

    def counting(self, *a, **kw):
        calls["spark"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "_select_files_spark", counting)
    t.read().count()  # tiny manifests: driver path
    assert calls["spark"] == 0
    monkeypatch.setattr(LakeTable, "PLAN_DISTRIBUTED_MIN_BYTES", 1)
    t.read().count()  # threshold crossed: distributed path
    assert calls["spark"] >= 1
