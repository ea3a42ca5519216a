"""Streaming append mode for patch/aggregate tables: every event row
lands exactly once across epochs, kills, and redelivery; merge semantics
resolve at read time through the mode's collapse operator."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.operators.partial_update import partial_update_collapse
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.streaming.pipeline import run_stream, write_wal
from tests.conftest import SF_SMOKE


def _patchify(df):
    is_upd = F.col("op") == "update"
    return df.select(
        "url", "lsn", "warc_ts", "op",
        F.when((F.col("op") == "insert") | (is_upd & (F.col("lsn") % 3 != 0)),
               F.col("html")).alias("html"),
        F.when((F.col("op") == "insert") | (is_upd & (F.col("lsn") % 3 != 1)),
               F.col("lang")).alias("lang"),
    )


def _collapsed(table: LakeTable):
    cur = partial_update_collapse(
        table.read(raw=True), "url", "lsn", ["html", "lang"]
    )
    return sorted(
        (r["url"], r["lsn"], r["lang"],
         None if r["html"] is None else len(r["html"]))
        for r in cur.collect()
    )


def _collapsed_feed(spark):
    """Oracle: the same collapse over the patch feed applied directly."""
    feed = _patchify(cl.changelog(spark, SF_SMOKE))
    want = partial_update_collapse(feed, "url", "lsn", ["html", "lang"])
    return sorted(
        (r["url"], r["lsn"], r["lang"],
         None if r["html"] is None else len(r["html"]))
        for r in want.collect()
    )


def _mk_patch_wal(spark, root, n_files=4):
    wal = os.path.join(root, "wal")
    write_wal(spark, SF_SMOKE, wal, n_files=n_files)
    # rewrite each segment as a patch feed (same schema, NULLed columns)
    for seg in sorted(os.listdir(wal)):
        p = os.path.join(wal, seg)
        patched = _patchify(spark.read.parquet(p))
        patched.write.mode("overwrite").parquet(p + ".tmp")
        import shutil

        shutil.rmtree(p)
        os.rename(p + ".tmp", p)
    return wal


def test_append_stream_equals_batch_patch_feed(spark):
    root = tempfile.mkdtemp(prefix="stream_patch_")
    wal = _mk_patch_wal(spark, root)
    q = run_stream(
        spark, wal, os.path.join(root, "t"), os.path.join(root, "ckpt"),
        n_buckets=8, record_metrics=False, merge_mode="append",
    )
    q.awaitTermination()
    t = LakeTable(spark, os.path.join(root, "t"))
    assert _collapsed(t) == _collapsed_feed(spark)
    # every physical event row landed exactly once
    n_events = cl.changelog(spark, SF_SMOKE).count()
    assert t.read(raw=True).count() == n_events


def test_append_stream_kill_resume_no_double_append(spark):
    root = tempfile.mkdtemp(prefix="stream_patch_kill_")
    wal = _mk_patch_wal(spark, root)
    q = run_stream(
        spark, wal, os.path.join(root, "t"), os.path.join(root, "ckpt"),
        n_buckets=8, record_metrics=False, merge_mode="append",
        fail_after_batches=2, fail_mode="after",  # post-commit crash window
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    q2 = run_stream(
        spark, wal, os.path.join(root, "t"), os.path.join(root, "ckpt"),
        n_buckets=8, record_metrics=False, merge_mode="append",
    )
    q2.awaitTermination()
    t = LakeTable(spark, os.path.join(root, "t"))
    # the redelivered epoch no-oped: exact event count, no duplicates
    assert t.read(raw=True).count() == cl.changelog(spark, SF_SMOKE).count()


def test_append_mode_dlq_allows_null_patch_columns(spark):
    """A patch event's NULL payload columns are state, not violations:
    with the DLQ armed, only structurally-bad rows (null key) quarantine
    — the 127k-row quarantine storm the first append soak hit."""
    root = tempfile.mkdtemp(prefix="stream_patch_dlq_")
    wal = _mk_patch_wal(spark, root, n_files=2)
    # poison one row (null key) inside the first segment
    seg = os.path.join(wal, sorted(os.listdir(wal))[0])
    df = spark.read.parquet(seg)
    bad = df.limit(1).withColumn("url", F.lit(None).cast("string"))
    df.unionByName(bad).write.mode("overwrite").parquet(seg + ".tmp")
    import shutil

    shutil.rmtree(seg)
    os.rename(seg + ".tmp", seg)
    q = run_stream(
        spark, wal, os.path.join(root, "t"), os.path.join(root, "ckpt"),
        n_buckets=8, record_metrics=False, merge_mode="append",
        dlq_root=os.path.join(root, "dlq"),
    )
    q.awaitTermination()
    t = LakeTable(spark, os.path.join(root, "t"))
    dlq = LakeTable(spark, os.path.join(root, "dlq"))
    assert dlq.read().count() == 1  # ONLY the poisoned row
    assert t.read(raw=True).count() == cl.changelog(spark, SF_SMOKE).count()
    assert _collapsed(t) == _collapsed_feed(spark)


def test_stream_mode_props_declare_engine_read_collapses(spark):
    """mode_props stamps the merge engine into the stream's table, so a
    plain read() returns the stitched patch state — and the UNDECLARED
    default refuses a non-raw read instead of silently LWW-folding."""
    root = tempfile.mkdtemp(prefix="stream_props_")
    wal = _mk_patch_wal(spark, root, n_files=2)
    q = run_stream(
        spark, wal, os.path.join(root, "t"), os.path.join(root, "ckpt"),
        n_buckets=8, record_metrics=False, merge_mode="append",
        mode_props={"merge.mode": "patch",
                    "merge.patch.cols": ["html", "lang"]},
    )
    q.awaitTermination()
    t = LakeTable(spark, os.path.join(root, "t"))
    got = sorted(
        (r["url"], r["lsn"], r["lang"],
         None if r["html"] is None else len(r["html"]))
        for r in t.read().collect()
    )
    assert got == _collapsed_feed(spark)

    # undeclared default: read() refuses, raw read works
    root2 = tempfile.mkdtemp(prefix="stream_noprops_")
    wal2 = _mk_patch_wal(spark, root2, n_files=2)
    q2 = run_stream(
        spark, wal2, os.path.join(root2, "t"), os.path.join(root2, "ckpt"),
        n_buckets=8, record_metrics=False, merge_mode="append",
    )
    q2.awaitTermination()
    t2 = LakeTable(spark, os.path.join(root2, "t"))
    with pytest.raises(ValueError, match="raw=True"):
        t2.read()
    assert _collapsed(t2) == _collapsed_feed(spark)


def test_mode_props_refused_on_lww_path(spark):
    root = tempfile.mkdtemp(prefix="stream_props_lww_")
    with pytest.raises(ValueError, match="mode_props"):
        run_stream(
            spark, os.path.join(root, "wal"), os.path.join(root, "t"),
            os.path.join(root, "ckpt"), merge_mode="lww",
            mode_props={"merge.mode": "patch"},
        )


def test_append_mode_refuses_lww_watermark(spark):
    root = tempfile.mkdtemp(prefix="stream_patch_refuse_")
    with pytest.raises(ValueError, match="append merge_mode"):
        run_stream(
            spark, os.path.join(root, "wal"), os.path.join(root, "t"),
            os.path.join(root, "ckpt"), merge_mode="append", watermark_days=7,
        )


def test_append_mode_compaction_cadence_bounds_files(spark):
    """compact_every on an append stream runs the FILES-ONLY rewrite:
    event multiset preserved exactly, per-bucket file counts bounded."""
    root = tempfile.mkdtemp(prefix="stream_patch_compact_")
    wal = _mk_patch_wal(spark, root, n_files=6)
    q = run_stream(
        spark, wal, os.path.join(root, "t"), os.path.join(root, "ckpt"),
        n_buckets=8, record_metrics=False, merge_mode="append",
        compact_every=2,
    )
    q.awaitTermination()
    t = LakeTable(spark, os.path.join(root, "t"))
    assert t.read(raw=True).count() == cl.changelog(spark, SF_SMOKE).count()
    assert _collapsed(t) == _collapsed_feed(spark)
    snap = t.current()
    # 6 epochs appended; cadence-2 rewrites keep every bucket under the
    # uncompacted 6-files bound (the tail appended after the last rewrite)
    assert max(
        len(t.bucket_entries(snap, b)) for b in snap.manifests
    ) <= 3
