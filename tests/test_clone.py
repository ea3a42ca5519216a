"""Shallow clone: zero-copy read equality, write independence in both
directions, exactly-once carry-over, vacuum safety, and materialization
via compaction (no external references remain)."""

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from data_pipeline_spark.lake.clone import clone_table, external_refs
from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.pipeline import ensure_table


def _batch(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, lsn bigint, warc_ts string, html binary, "
        "lang string, op string"
    )
    return df.select(
        "url", "lsn", F.to_timestamp("warc_ts").alias("warc_ts"), "html",
        F.lit(None).cast("string").alias("text"), "lang", "op",
    )


def _mk(spark):
    src = ensure_table(spark, tempfile.mkdtemp(prefix="cl_src_"), 4)
    merge_into(src, _batch(spark, [
        ("u1", 1, "2024-01-01 00:00:00", b"a", "en", "insert"),
        ("u2", 2, "2024-01-01 00:00:00", b"b", "de", "insert"),
    ]), "m0")
    return src


def _state(t):
    return sorted((r.url, r.lsn, r.lang) for r in t.read().collect())


def test_clone_reads_equal_and_writes_are_independent(spark):
    src = _mk(spark)
    cl = clone_table(src, tempfile.mkdtemp(prefix="cl_dst_"))
    assert _state(cl) == _state(src)
    assert len(external_refs(cl)) > 0  # zero-copy: still source-backed

    merge_into(cl, _batch(spark, [
        ("u3", 3, "2024-01-02 00:00:00", b"c", "fr", "insert"),
    ]), "c0")
    merge_into(src, _batch(spark, [
        ("u4", 4, "2024-01-02 00:00:00", b"d", "es", "insert"),
    ]), "m1")
    assert _state(cl) == [("u1", 1, "en"), ("u2", 2, "de"), ("u3", 3, "fr")]
    assert _state(src) == [("u1", 1, "en"), ("u2", 2, "de"), ("u4", 4, "es")]


def test_commit_keys_carry_over(spark):
    src = _mk(spark)
    cl = clone_table(src, tempfile.mkdtemp(prefix="cl_dst_"))
    v = cl.current().version
    # replaying the source's applied batch against the clone is a no-op
    merge_into(cl, _batch(spark, [
        ("u9", 9, "2024-01-09 00:00:00", b"z", "en", "insert"),
    ]), "m0")
    assert cl.current().version == v
    assert _state(cl) == _state(src)


def test_clone_vacuum_never_touches_source(spark):
    src = _mk(spark)
    cl = clone_table(src, tempfile.mkdtemp(prefix="cl_dst_"))
    merge_into(cl, _batch(spark, [
        ("u3", 3, "2024-01-02 00:00:00", b"c", "fr", "insert"),
    ]), "c0")
    cl.expire_snapshots(keep_last=1)
    cl.vacuum()
    assert _state(src) == [("u1", 1, "en"), ("u2", 2, "de")]
    assert _state(cl) == [("u1", 1, "en"), ("u2", 2, "de"), ("u3", 3, "fr")]


def test_compaction_materializes_clone(spark):
    src = _mk(spark)
    cl = clone_table(src, tempfile.mkdtemp(prefix="cl_dst_"))
    cl.compact("mat-0")
    assert external_refs(cl) == []
    # the source can disappear entirely; the clone is self-contained
    shutil.rmtree(src.root)
    assert _state(cl) == [("u1", 1, "en"), ("u2", 2, "de")]


def test_clone_refuses_existing_root(spark):
    src = _mk(spark)
    with pytest.raises(ValueError, match="already holds"):
        clone_table(src, src.root)
