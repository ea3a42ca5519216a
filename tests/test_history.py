"""history() metadata table: one row per surviving snapshot, head
flagged, ops labeled, and expiry shrinks it."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.pipeline import ensure_table


def test_history_tracks_ops_and_expiry(spark):
    t = ensure_table(spark, tempfile.mkdtemp(prefix="hist_"), 4)
    df = spark.createDataFrame(
        [("u1", 1, "2024-01-01 00:00:00", b"a", "en", "insert")],
        "url string, lsn bigint, warc_ts string, html binary, "
        "lang string, op string",
    ).select(
        "url", "lsn", F.to_timestamp("warc_ts").alias("warc_ts"), "html",
        F.lit(None).cast("string").alias("text"), "lang", "op",
    )
    merge_into(t, df, "m0")
    t.compact("c0")
    h = {r.version: r for r in t.history().collect()}
    assert [h[v].op for v in sorted(h)] == ["create", "merge", "compact"]
    assert h[max(h)].is_current and not h[0].is_current
    assert h[2].n_commits == 2  # m0 + c0 accumulated

    t.expire_snapshots(keep_last=1)
    assert t.history().count() == 1


def test_as_of_timestamp_time_travel(spark):
    import time as _time

    from data_pipeline_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="asof_"),
        [("url", "string"), ("lsn", "bigint"), ("v", "string")], "url", 2,
    )

    def commit(i):
        df = spark.createDataFrame(
            [(f"u{i}", i, "x")], "url string, lsn bigint, v string"
        )
        t.commit_delta(df, f"c{i}")
        return _time.time()

    t0 = t.current().committed_at  # create stamp
    ts1 = commit(1)
    _time.sleep(0.02)
    ts2 = commit(2)
    _time.sleep(0.02)
    commit(3)

    # stamps are monotonic and history exposes them
    stamps = [r.committed_at for r in
              t.history().orderBy("version").collect()]
    assert stamps == sorted(stamps) and stamps[0] > 0

    assert t.snapshot_as_of(ts1).version == 1
    assert t.read_as_of(ts2).count() == 2
    assert t.snapshot_as_of(_time.time()).version == t.current().version
    # before the table existed -> loud error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.snapshot_as_of(t0 - 1.0)
    # expired history cannot be resurrected
    t.expire_snapshots(keep_last=1)
    with _pytest.raises(ValueError):
        t.snapshot_as_of(ts1)
