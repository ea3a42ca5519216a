"""Streaming DLQ: contract violations arriving on the WAL tail route to
the dead-letter table per epoch; the applied state equals a replay of
the clean events only; a checkpointed re-drain adds nothing."""

import os
import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.streaming.pipeline import WAL_SCHEMA, run_stream


def _poisoned_wal(spark, d, n_segments=3):
    """Three LSN-ordered WAL segments; every 5th non-delete event has a
    NULL payload, every 7th a bad op."""
    rows = []
    for i in range(60):
        op = "delete" if i % 11 == 10 else ("insert" if i % 3 == 0 else "update")
        html = None if op == "delete" or i % 5 == 0 else b"<body>x</body>"
        if i % 7 == 6:
            op = "upsert"
        rows.append(
            (f"https://s/{i % 20}", i + 1, "2024-01-01 00:00:00", op, html, "en")
        )
    df = spark.createDataFrame(
        rows, "url string, lsn bigint, warc_ts string, op string, "
        "html binary, lang string"
    ).select(
        "url", "lsn", F.to_timestamp("warc_ts").alias("warc_ts"),
        "op", "html", "lang",
    )
    os.makedirs(d, exist_ok=True)
    span = 60 // n_segments
    for s in range(n_segments):
        (df.filter((F.col("lsn") > s * span) & (F.col("lsn") <= (s + 1) * span))
         .coalesce(1).write.parquet(os.path.join(d, f"seg-{s}")))
    return df


def _drain(spark, wal, root, ckpt, dlq_root):
    q = run_stream(
        spark, wal, root, ckpt, n_buckets=4, record_metrics=False,
        available_now=True, dlq_root=dlq_root,
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()


def test_stream_quarantines_and_state_matches_clean_replay(spark):
    wal = tempfile.mkdtemp(prefix="wal_dlq_")
    df = _poisoned_wal(spark, wal)
    root = tempfile.mkdtemp(prefix="lake_sdlq_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_sdlq_")
    dlq_root = tempfile.mkdtemp(prefix="dlq_sdlq_")
    _drain(spark, wal, root, ckpt, dlq_root)

    dlq = LakeTable(spark, dlq_root)
    bad = df.filter(
        ~F.col("op").isin("insert", "update", "delete")
        | ((F.col("op") != "delete") & F.col("html").isNull())
    )
    assert dlq.read().count() == bad.count() > 0
    # applied state == LWW over the CLEAN events only
    clean = df.exceptAll(bad)
    want = sorted(
        (r.url, r.lsn) for r in
        clean.groupBy("url").agg(F.max_by(F.struct("lsn", "op"), "lsn").alias("w"))
        .select("url", F.col("w.lsn").alias("lsn"), F.col("w.op").alias("op"))
        .filter(F.col("op") != "delete").collect()
    )
    table = LakeTable(spark, root)
    got = sorted((r.url, r.lsn) for r in table.read().collect())
    assert got == want

    # checkpointed re-drain: nothing new, both tables unchanged
    v_t, v_d = table.current().version, dlq.current().version
    _drain(spark, wal, root, ckpt, dlq_root)
    assert LakeTable(spark, root).current().version == v_t
    assert LakeTable(spark, dlq_root).current().version == v_d
