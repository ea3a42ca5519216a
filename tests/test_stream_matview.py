"""In-stream materialized-view maintenance (run_stream matview_spec=):
the view folds inside the stream loop on a cadence, is idempotent across
the post-commit double-fire, and equals a from-scratch recompute."""

import os

from pyspark.sql import functions as F

from data_pipeline_spark.matview import AggSpec, IncrementalView
from data_pipeline_spark.pipeline import ensure_table
from data_pipeline_spark.streaming.pipeline import (
    run_stream,
    stream_to_completion,
    write_wal,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

GROUP_BY = [
    ("domain", "string", "regexp_extract(url, 'https://([^/]+)/', 1)")
]
AGGS = [
    AggSpec("n_pages", "count"),
    AggSpec("text_chars", "sum", "length(text)"),
    AggSpec("lsn_max", "max", "lsn"),
]


def _spec(root, every=1):
    return {
        "root": root,
        "group_by": GROUP_BY,
        "aggs": AGGS,
        "source_columns": ["text"],
        "refresh_every": every,
    }


def _view(spark, table_root, view_root):
    return IncrementalView(
        spark, ensure_table(spark, table_root, 8), view_root,
        group_by=GROUP_BY, aggs=AGGS, source_columns=["text"],
        n_buckets=16,
    )


def _recompute(table):
    return sorted(
        table.read()
        .groupBy(
            F.expr("regexp_extract(url, 'https://([^/]+)/', 1)").alias(
                "domain"
            )
        )
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("text")).alias("text_chars"),
            F.max("lsn").alias("lsn_max"),
        )
        .collect()
    )


def test_stream_matview_cadence_plus_tail_equals_recompute(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(spark, SF_DIR, wal, n_files=3)
    troot, vroot = str(tmp_path / "table"), str(tmp_path / "view")
    table = stream_to_completion(
        spark, wal, troot, str(tmp_path / "ckpt"),
        n_buckets=8, record_metrics=False, matview_spec=_spec(vroot, every=2),
    )
    view = _view(spark, troot, vroot)
    # epoch 3 landed after the last cadence tick — view is behind by design
    assert view.source_version() < table.current().version
    view.refresh()
    assert sorted(view.read().collect()) == _recompute(table)


def test_stream_matview_survives_post_commit_double_fire(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(spark, SF_DIR, wal, n_files=4)
    troot, vroot = str(tmp_path / "table"), str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    q = run_stream(
        spark, wal, troot, ckpt, n_buckets=8, record_metrics=False,
        available_now=True, matview_spec=_spec(vroot, every=1),
        fail_after_batches=2, fail_mode="after",
    )
    try:
        q.awaitTermination(300)
    except Exception:
        pass
    finally:
        if q.isActive:
            q.stop()
    # epoch 2 applied AND folded into the view, but the offset did not
    # advance: the redelivered epoch must no-op in BOTH places.
    table = stream_to_completion(
        spark, wal, troot, ckpt,
        n_buckets=8, record_metrics=False, matview_spec=_spec(vroot, every=1),
    )
    view = _view(spark, troot, vroot)
    assert view.source_version() == table.current().version
    assert sorted(view.read().collect()) == _recompute(table)


def test_stream_matview_composes_with_compaction_cadence(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(spark, SF_DIR, wal, n_files=4)
    troot, vroot = str(tmp_path / "table"), str(tmp_path / "view")
    table = stream_to_completion(
        spark, wal, troot, str(tmp_path / "ckpt"),
        n_buckets=8, record_metrics=False,
        matview_spec=_spec(vroot, every=1), compact_every=2,
    )
    view = _view(spark, troot, vroot)
    view.refresh()  # fold any trailing compaction commits (no-op diffs)
    assert sorted(view.read().collect()) == _recompute(table)
