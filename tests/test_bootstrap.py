"""Snapshot bootstrap → WAL handoff (data_pipeline_spark/bootstrap.py).

The hybrid-source contract: a consistent snapshot at WAL position L plus a
gap-free at-least-once tail from any checkpoint P <= L converges to exactly
the full-replay state. Reference analog: bulk convert then incremental
watch loop (reference: scripts/ingest_v1_s1_rtc.py:323-420,
scripts/watch_cdse_and_process.py:241-277).
"""

import datetime as dt
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.bootstrap import (
    BOOTSTRAP_LSN_PROP,
    bootstrap_lsn,
    bootstrap_snapshot,
    tail_wal,
)
from data_pipeline_spark.extraction import extract_text
from data_pipeline_spark.operators.lww import last_writer_wins
from data_pipeline_spark.pipeline import ensure_table
from tests.conftest import SF_SMOKE


def _final(table):
    return sorted(
        table.read()
        .select("url", "lsn", "lang", F.sha2("text", 256).alias("h"))
        .collect()
    )


def _direct(spark, log):
    latest = last_writer_wins(log, "url", "lsn")
    return sorted(
        latest.filter(F.col("op") != "delete")
        .select(
            "url", "lsn", "lang",
            F.sha2(extract_text("html"), 256).alias("h"),
        )
        .collect()
    )


def _snapshot_at(log, split):
    latest = last_writer_wins(log.filter(F.col("lsn") <= split), "url", "lsn")
    return (
        latest.filter(F.col("op") != "delete")
        .withColumn("text", extract_text("html"))
        .select("url", "lsn", "warc_ts", "html", "text", "lang")
    )


def test_handoff_matches_full_replay(spark, tmp_path):
    log = cl.changelog(spark, SF_SMOKE)
    split = log.agg(F.max("lsn")).first()[0] // 2
    table = ensure_table(spark, str(tmp_path / "t"), n_buckets=8)
    bootstrap_snapshot(table, _snapshot_at(log, split), split)
    assert bootstrap_lsn(table) == split
    tail_wal(table, log, from_lsn=int(split * 0.9), n_batches=3)
    assert _final(table) == _direct(spark, log)


def test_full_overlap_tail_is_absorbed(spark, tmp_path):
    # Checkpoint at 0: the ENTIRE feed is redelivered over the snapshot.
    log = cl.changelog(spark, SF_SMOKE)
    split = log.agg(F.max("lsn")).first()[0] // 2
    table = ensure_table(spark, str(tmp_path / "t"), n_buckets=8)
    bootstrap_snapshot(table, _snapshot_at(log, split), split)
    tail_wal(table, log, from_lsn=-1, n_batches=2)
    assert _final(table) == _direct(spark, log)


def _mini_log(spark, rows):
    # rows: (url, lsn, op)
    return spark.createDataFrame(
        [
            (
                u,
                l,
                dt.datetime(2024, 1, 1) + dt.timedelta(seconds=l),
                o,
                f"<html><body>{u}@{l}</body></html>".encode(),
                "en",
            )
            for (u, l, o) in rows
        ],
        "url string, lsn bigint, warc_ts timestamp, op string, "
        "html binary, lang string",
    )


def test_overlap_delete_and_reinsert_races(spark, tmp_path):
    # A: inserted@1, deleted@2 (<= L) -> absent from snapshot; the overlap
    #    redelivers BOTH events — the tombstone fences, A stays dead.
    # B: inserted@1, updated@5 (> L) -> snapshot B@1, tail wins with @5.
    # C: deleted@3 (<= L), REINSERTED@6 in the tail -> alive at @6.
    # D: inserted@7 only (> L) -> new key from the tail.
    log = _mini_log(
        spark,
        [
            ("A", 1, "insert"), ("A", 2, "delete"),
            ("B", 1, "insert"), ("B", 5, "update"),
            ("C", 1, "insert"), ("C", 3, "delete"), ("C", 6, "insert"),
            ("D", 7, "insert"),
        ],
    )
    split = 4
    table = ensure_table(spark, str(tmp_path / "t"), n_buckets=4)
    bootstrap_snapshot(table, _snapshot_at(log, split), split)
    tail_wal(table, log, from_lsn=0, n_batches=2)  # full overlap
    state = {r["url"]: r["lsn"] for r in table.read().collect()}
    assert state == {"B": 5, "C": 6, "D": 7}


def test_inconsistent_snapshot_refused(spark, tmp_path):
    log = _mini_log(spark, [("A", 9, "insert")])
    table = ensure_table(spark, str(tmp_path / "t"), n_buckets=4)
    snap = _snapshot_at(log, 9)
    with pytest.raises(ValueError, match="inconsistent snapshot"):
        bootstrap_snapshot(table, snap, snapshot_lsn=4)


def test_non_empty_table_refused_and_retry_noops(spark, tmp_path):
    log = _mini_log(spark, [("A", 1, "insert"), ("B", 2, "insert")])
    table = ensure_table(spark, str(tmp_path / "t"), n_buckets=4)
    snap = _snapshot_at(log, 2)
    st = bootstrap_snapshot(table, snap, 2)
    assert st.applied
    # Crashed-and-retried bootstrap (same key): recorded no-op.
    st2 = bootstrap_snapshot(table, snap, 2)
    assert not st2.applied and table.current().version == st.version
    # A DIFFERENT bootstrap over existing state: loud refusal.
    with pytest.raises(ValueError, match="empty table"):
        bootstrap_snapshot(table, snap, 2, commit_key="other")


def test_watermark_mode_stamps_position(spark, tmp_path):
    log = _mini_log(spark, [("A", 1, "insert"), ("B", 3, "update")])
    table = ensure_table(spark, str(tmp_path / "t"), n_buckets=4)
    bootstrap_snapshot(table, _snapshot_at(log, 3), 3, lsn_col=None)
    rows = {r["url"]: r["lsn"] for r in table.read().collect()}
    assert rows == {"A": 3, "B": 3}  # Debezium READ-event shape


def test_tail_requires_position_on_unbootstrapped_table(spark, tmp_path):
    log = _mini_log(spark, [("A", 1, "insert")])
    table = ensure_table(spark, str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(ValueError, match="start position"):
        tail_wal(table, log)


def test_bootstrap_then_stream_converges(spark, tmp_path):
    """The streaming path over the FULL WAL after a bootstrap: every
    pre-watermark epoch is absorbed by the lsn race, post-watermark
    epochs apply — final state == full replay, exactly-once keys intact."""
    from data_pipeline_spark.streaming.pipeline import run_stream, write_wal

    wal = str(tmp_path / "wal")
    write_wal(spark, SF_SMOKE, wal, n_files=4)
    log = cl.changelog(spark, SF_SMOKE)
    split = log.agg(F.max("lsn")).first()[0] // 2
    root = str(tmp_path / "t")
    table = ensure_table(spark, root, n_buckets=8)
    bootstrap_snapshot(table, _snapshot_at(log, split), split)
    run_stream(
        spark, wal, root, str(tmp_path / "ckpt"),
        n_buckets=8, record_metrics=False,
    ).awaitTermination()
    assert _final(table) == _direct(spark, log)
    assert BOOTSTRAP_LSN_PROP in table.current().props
