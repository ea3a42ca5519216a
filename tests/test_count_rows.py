"""count_rows(): COUNT(*) answered from manifest row counts for all-base
buckets, scanning only the delta tail (Iceberg count-pushdown shape)."""

import os

from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.pipeline import (
    apply_append_batch,
    apply_batch,
    ensure_event_table,
    replay,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_delta_table_counts_by_pruned_scan(spark, tmp_path):
    t = replay(spark, SF_DIR, str(tmp_path / "t"), n_batches=3,
               n_buckets=8, record_metrics=False)
    plan = t.count_rows(with_plan=True)
    assert plan["count"] == t.read().count()
    assert plan["scanned_buckets"]  # merge-on-read deltas force the scan


def test_compacted_table_counts_from_metadata_only(spark, tmp_path):
    t = replay(spark, SF_DIR, str(tmp_path / "t"), n_batches=3,
               n_buckets=8, record_metrics=False)
    t.compact("c1")
    plan = t.count_rows(with_plan=True)
    # the feed contains deletes → live_rows must exclude kept tombstones
    assert plan["count"] == t.read().count()
    assert plan["scanned_buckets"] == []
    assert len(plan["metadata_buckets"]) == 8


def test_mixed_table_scans_only_delta_buckets(spark, tmp_path):
    t = replay(spark, SF_DIR, str(tmp_path / "t"), n_batches=3,
               n_buckets=8, record_metrics=False)
    t.compact("c1")
    late = cl.changelog(spark, SF_DIR).orderBy(F.desc("lsn")).limit(5)
    apply_batch(t, late, commit_key="late", record_metrics=False)
    plan = t.count_rows(with_plan=True)
    assert plan["count"] == t.read().count()
    assert plan["scanned_buckets"] and plan["metadata_buckets"]
    assert len(plan["scanned_buckets"]) < 8


def test_raw_count_includes_tombstones(spark, tmp_path):
    t = replay(spark, SF_DIR, str(tmp_path / "t"), n_batches=3,
               n_buckets=8, record_metrics=False)
    t.compact("c1")
    raw = t.count_rows(raw=True, with_plan=True)
    assert raw["scanned_buckets"] == []  # raw is always a metadata sum
    assert raw["count"] == t.read(
        raw=True, include_tombstones=True
    ).count()
    assert raw["count"] > t.count_rows()  # fenced tombstones persist


def test_event_table_requires_raw_and_counts_events(spark, tmp_path):
    import pytest

    t = ensure_event_table(spark, str(tmp_path / "ev"), 8)
    log = cl.changelog(spark, SF_DIR)
    apply_append_batch(t, log, commit_key="e0", record_metrics=False)
    with pytest.raises(ValueError, match="raw=True"):
        t.count_rows()
    assert t.count_rows(raw=True) == log.count()


def test_bucket_subset_count(spark, tmp_path):
    t = replay(spark, SF_DIR, str(tmp_path / "t"), n_batches=2,
               n_buckets=8, record_metrics=False)
    t.compact("c1")
    sub = {0, 3, 5}
    assert t.count_rows(buckets=sub) == t.read(buckets=sub).count()


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    t = replay(spark, SF_DIR, str(tmp_path / "t"), n_batches=2,
               n_buckets=8, record_metrics=False)
    t.compact("c1")
    t.expire_snapshots(keep_last=1, respect_consumers=False)
    would = t.vacuum(dry_run=True)
    assert would > 0
    assert t.read().count() == t.count_rows()  # nothing was touched
    assert t.vacuum() == would  # the real sweep removes exactly that many
    assert t.vacuum(dry_run=True) == 0
