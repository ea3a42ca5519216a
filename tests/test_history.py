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
