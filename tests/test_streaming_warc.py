"""Streaming ingestion from WARC segment drops (run_stream
source_format="warc"): same exactly-once machinery, Common Crawl
landing-zone source shape."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.operators.lww import last_writer_wins
from data_pipeline_spark.streaming.pipeline import (
    run_stream,
    stream_to_completion,
    write_warc_wal,
)
from tests.conftest import SF_SMOKE


def _expected(spark):
    log = cl.changelog(spark, SF_SMOKE)
    latest = last_writer_wins(log, "url", "lsn")
    rows = latest.filter(F.col("op") != "delete").select(
        "url", "lsn", F.sha2("text", 256)
    )
    # the table stores extracted text; recompute the comparable projection
    return None, rows


def _final(table):
    return sorted(
        (r["url"], r["lsn"], r["text_sha"])
        for r in table.read()
        .selectExpr("url", "lsn", "sha2(text, 256) AS text_sha")
        .collect()
    )


def _batch_oracle(spark):
    from data_pipeline_spark.pipeline import replay

    t = replay(spark, SF_SMOKE, tempfile.mkdtemp(prefix="lake_wo_"),
               n_batches=2)
    return _final(t)


def test_warc_stream_matches_batch_replay(spark):
    wal = tempfile.mkdtemp(prefix="warcwal_")
    assert write_warc_wal(spark, SF_SMOKE, wal, n_files=4) == 4
    table = stream_to_completion(
        spark, wal, tempfile.mkdtemp(prefix="lake_ws_"),
        tempfile.mkdtemp(prefix="ck_ws_"),
        n_buckets=8, record_metrics=False, source_format="warc",
    )
    assert _final(table) == _batch_oracle(spark)


def test_warc_stream_kill_resume_exactly_once(spark):
    wal = tempfile.mkdtemp(prefix="warcwal_kr_")
    write_warc_wal(spark, SF_SMOKE, wal, n_files=4)
    root = tempfile.mkdtemp(prefix="lake_wkr_")
    ck = tempfile.mkdtemp(prefix="ck_wkr_")
    q = run_stream(
        spark, wal, root, ck, n_buckets=8, record_metrics=False,
        source_format="warc", fail_after_batches=2, fail_mode="after",
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    table = stream_to_completion(
        spark, wal, root, ck, n_buckets=8, record_metrics=False,
        source_format="warc",
    )
    # the post-commit double-fire epoch redelivers and no-ops
    assert _final(table) == _batch_oracle(spark)


def test_warc_source_guards(spark):
    with pytest.raises(ValueError, match="warc source streams segment"):
        run_stream(
            spark, "/tmp/x", tempfile.mkdtemp(), tempfile.mkdtemp(),
            source_format="warc", reread_files=False,
        )
    with pytest.raises(ValueError, match="unknown source_format"):
        run_stream(
            spark, "/tmp/x", tempfile.mkdtemp(), tempfile.mkdtemp(),
            source_format="orc",
        )
