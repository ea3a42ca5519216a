"""Commit-key retention (lake/table.py): the exactly-once ledger stays
bounded — `commit.retention.keys` property + expire_commit_keys()."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable


def _mk(spark, props=None):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_ckr_"),
        [("url", "string"), ("lsn", "bigint"), ("v", "string")],
        "url", 2, props=props,
    )


def _row(spark, url, lsn, v):
    return spark.createDataFrame(
        [(url, lsn, v, "insert")], "url string, lsn bigint, v string, op string"
    )


def test_retention_property_bounds_the_ledger(spark):
    t = _mk(spark, props={"commit.retention.keys": 5})
    for i in range(10):
        merge_into(t, _row(spark, f"u{i}", i, f"v{i}"), f"k{i}")
    snap = t.current()
    assert len(snap.commits) == 5
    # the NEWEST keys by version survive
    assert set(snap.commits) == {f"k{i}" for i in range(5, 10)}
    # replay inside the window: recorded no-op
    v = snap.version
    merge_into(t, _row(spark, "u9", 99, "zz"), "k9")
    assert t.current().version == v
    # replay below the window re-applies (the documented horizon contract)
    merge_into(t, _row(spark, "u0", 100, "re"), "k0")
    assert t.current().version == v + 1
    assert t.read().filter(F.col("url") == "u0").first()["v"] == "re"


def test_default_keeps_every_key(spark):
    t = _mk(spark)
    for i in range(10):
        merge_into(t, _row(spark, f"u{i}", i, f"v{i}"), f"k{i}")
    assert len(t.current().commits) == 10


def test_expire_commit_keys_action(spark):
    t = _mk(spark)
    for i in range(6):
        merge_into(t, _row(spark, f"u{i}", i, f"v{i}"), f"k{i}")
    horizon = t.current().commits["k3"]
    snap = t.expire_commit_keys(horizon, "expire-1")
    assert snap.summary["op"] == "expire_commit_keys"
    kept = set(t.current().commits)
    assert {"k3", "k4", "k5", "expire-1"} <= kept
    assert not {"k0", "k1", "k2"} & kept
    # idempotent on its own commit key
    v = t.current().version
    assert t.expire_commit_keys(horizon, "expire-1").version == v
    # nothing below the horizon -> None, no empty commit
    assert t.expire_commit_keys(horizon, "expire-2") is None
    assert t.current().version == v
    # data untouched throughout
    assert t.read().count() == 6
