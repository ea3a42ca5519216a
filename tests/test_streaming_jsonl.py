"""Streaming ingestion from Debezium-envelope JSONL segment drops
(run_stream source_format="jsonl"): same exactly-once machinery, the
Kafka-Connect object-store landing-zone source shape."""

import os
import tempfile

import pytest

from data_pipeline_spark.streaming.pipeline import (
    run_stream,
    stream_to_completion,
    write_jsonl_wal,
)
from tests.conftest import SF_SMOKE


def _final(table):
    return sorted(
        (r["url"], r["lsn"], r["text_sha"])
        for r in table.read()
        .selectExpr("url", "lsn", "sha2(text, 256) AS text_sha")
        .collect()
    )


def _batch_oracle(spark):
    from data_pipeline_spark.pipeline import replay

    t = replay(spark, SF_SMOKE, tempfile.mkdtemp(prefix="lake_jo_"),
               n_batches=2)
    return _final(t)


def test_jsonl_stream_matches_batch_replay(spark):
    wal = tempfile.mkdtemp(prefix="jsonlwal_")
    assert write_jsonl_wal(spark, SF_SMOKE, wal, n_files=4) == 4
    table = stream_to_completion(
        spark, wal, tempfile.mkdtemp(prefix="lake_js_"),
        tempfile.mkdtemp(prefix="ck_js_"),
        n_buckets=8, record_metrics=False, source_format="jsonl",
    )
    assert _final(table) == _batch_oracle(spark)


def test_jsonl_stream_kill_resume_exactly_once(spark):
    wal = tempfile.mkdtemp(prefix="jsonlwal_kr_")
    write_jsonl_wal(spark, SF_SMOKE, wal, n_files=4)
    root = tempfile.mkdtemp(prefix="lake_jkr_")
    ck = tempfile.mkdtemp(prefix="ck_jkr_")
    q = run_stream(
        spark, wal, root, ck, n_buckets=8, record_metrics=False,
        source_format="jsonl", fail_after_batches=2, fail_mode="after",
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    table = stream_to_completion(
        spark, wal, root, ck, n_buckets=8, record_metrics=False,
        source_format="jsonl",
    )
    # the post-commit double-fire epoch redelivers and no-ops
    assert _final(table) == _batch_oracle(spark)


def test_jsonl_corrupt_lines_quarantine_to_dlq(spark):
    from data_pipeline_spark.lake.table import LakeTable

    wal = tempfile.mkdtemp(prefix="jsonlwal_dlq_")
    write_jsonl_wal(spark, SF_SMOKE, wal, n_files=2)
    # land a poisoned segment: a torn line and a key-less envelope
    # (a fresh file, not an append — Hadoop's local FS checksums
    # Spark-written parts via .crc sidecars)
    pdir = os.path.join(wal, "seg-poison")
    os.makedirs(pdir)
    with open(os.path.join(pdir, "poison.txt"), "w") as f:
        f.write('{"op": "u", "after": {"lang"\n')          # torn JSON
        f.write('{"op": "u", "lsn": 999999999, "after": '
                '{"lang": "en"}}\n')                        # no url
    dlq_root = tempfile.mkdtemp(prefix="dlq_js_")
    table = stream_to_completion(
        spark, wal, tempfile.mkdtemp(prefix="lake_jd_"),
        tempfile.mkdtemp(prefix="ck_jd_"),
        n_buckets=8, record_metrics=False, source_format="jsonl",
        dlq_root=dlq_root,
    )
    assert _final(table) == _batch_oracle(spark)  # state unharmed
    dlq = LakeTable(spark, dlq_root).read()
    assert dlq.count() == 2  # both poisoned lines quarantined


def test_jsonl_source_guards(spark):
    with pytest.raises(ValueError, match="jsonl source streams segment"):
        run_stream(
            spark, "/tmp/x", tempfile.mkdtemp(), tempfile.mkdtemp(),
            source_format="jsonl", reread_files=False,
        )
