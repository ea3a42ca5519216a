"""Stream-stream interval join (streaming/joins.py): batch-join
equality under a span-covering watermark, exactly-once through the
post-commit double-fire window, and watermark eviction with a tight
delay."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.streaming.joins import (
    run_join_stream,
    write_metrics_wal,
)
from data_pipeline_spark.streaming.pipeline import write_wal

SF_DIR = "/root/testdata/sf0.001"


def _wals(spark, tmp_path, n_files=4):
    left = str(tmp_path / "wal_l")
    right = str(tmp_path / "wal_r")
    write_wal(spark, SF_DIR, left, n_files=n_files)
    write_metrics_wal(spark, left, right)
    return left, right


def _batch_join(spark, left, right, interval_s=600):
    l = spark.read.parquet(f"{left}/*").select(
        "url", "lsn", "warc_ts", "lang"
    )
    r = spark.read.parquet(f"{right}/*")
    return (
        l.alias("l")
        .join(
            r.alias("r"),
            F.expr(
                f"""l.url = r.url
                AND r.metric_ts >= l.warc_ts
                AND r.metric_ts <= l.warc_ts + interval {interval_s} seconds"""
            ),
            "inner",
        )
        .select(
            F.col("l.url").alias("url"), "lsn", "warc_ts", "lang",
            "metric_ts", "status", "nbytes",
        )
    )


def _multiset(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


def test_stream_equals_batch_join(spark, tmp_path):
    left, right = _wals(spark, tmp_path)
    t = run_join_stream(
        spark, left, right, str(tmp_path / "t"), str(tmp_path / "ckpt")
    )
    got = _multiset(t.read(raw=True).drop("__deleted"))
    want = _multiset(_batch_join(spark, left, right))
    assert got == want and sum(want.values()) > 0


def test_post_commit_crash_then_resume_no_dupes(spark, tmp_path):
    left, right = _wals(spark, tmp_path)
    # the injected RuntimeError surfaces wrapped as STREAM_FAILED
    with pytest.raises(Exception, match="STREAM_FAILED|injected post-commit"):
        run_join_stream(
            spark, left, right, str(tmp_path / "t"),
            str(tmp_path / "ckpt"), fail_after_batches=2,
        )
    t = run_join_stream(
        spark, left, right, str(tmp_path / "t"), str(tmp_path / "ckpt")
    )
    got = _multiset(t.read(raw=True).drop("__deleted"))
    want = _multiset(_batch_join(spark, left, right))
    assert got == want  # the double-fired epoch no-oped on its key


def test_tight_watermark_evicts_state(spark, tmp_path):
    """Metrics segments land in REVERSE order (each event's match
    arrives micro-batches later), and the watermark is far below that
    disorder — late matches drop, the documented Spark eviction
    semantic. The stream must yield a SUBSET of the batch join, and
    strictly fewer rows here."""
    left = str(tmp_path / "wal_l")
    right = str(tmp_path / "wal_r")
    write_wal(spark, SF_DIR, left, n_files=6)
    write_metrics_wal(spark, left, right, reverse=True)
    t = run_join_stream(
        spark, left, right, str(tmp_path / "t"), str(tmp_path / "ckpt"),
        watermark_s=60,
    )
    got = _multiset(t.read(raw=True).drop("__deleted"))
    want = _multiset(_batch_join(spark, left, right))
    assert all(got[k] <= want[k] for k in got)
    assert sum(got.values()) < sum(want.values())
