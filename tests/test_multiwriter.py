"""Sharded multi-writer ingest: N concurrent streams into ONE table,
each tailing a WAL shard routed to a disjoint bucket set (sharded by the
table's own bucket_expr). Writer-namespaced epoch keys keep each
writer's exactly-once independent; the optimistic disjoint-bucket
rebase lands racing commits without lost updates."""

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.pipeline import ensure_table, replay
from data_pipeline_spark.streaming.pipeline import run_stream
from tests.conftest import SF_SMOKE


def _state(t):
    return sorted(
        (r.url, r.lsn, r.h)
        for r in t.read()
        .selectExpr("url", "lsn", "sha2(text, 256) AS h")
        .collect()
    )


def _shard_wals(spark, t, base, n_segments=4):
    """Split the change log into two WALs by bucket parity (the table's
    own routing expression, so shard boundaries == bucket boundaries)."""
    snap = t.current()
    log = cl.changelog(spark, SF_SMOKE).withColumn(
        "__b", t.bucket_expr(snap)
    )
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    span = (hi - lo + 1 + n_segments - 1) // n_segments
    wals = []
    for parity in (0, 1):
        wal = os.path.join(base, f"wal_{parity}")
        shard = log.filter(F.col("__b") % 2 == parity).drop("__b")
        for i in range(n_segments):
            shard.filter(
                (F.col("lsn") >= lo + i * span)
                & (F.col("lsn") < lo + (i + 1) * span)
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(wal, f"seg-{i:05d}")
            )
        wals.append(wal)
    return wals


def test_two_sharded_writers_one_table(spark):
    base = tempfile.mkdtemp(prefix="mw_")
    root = os.path.join(base, "tbl")
    t = ensure_table(spark, root, 8)
    wal_a, wal_b = _shard_wals(spark, t, base)

    qa = run_stream(
        spark, wal_a, root, os.path.join(base, "ck_a"), n_buckets=8,
        writer_id="a", record_metrics=False,
    )
    qb = run_stream(
        spark, wal_b, root, os.path.join(base, "ck_b"), n_buckets=8,
        writer_id="b", record_metrics=False,
    )
    assert qa.awaitTermination(600) and qb.awaitTermination(600)

    # oracle: single-writer replay of the unsharded log
    want = _state(
        replay(spark, SF_SMOKE, os.path.join(base, "oracle"),
               n_batches=4, n_buckets=8, record_metrics=False)
    )
    assert _state(t) == want

    # both writers' epochs recorded independently (no key collisions)
    commits = t.current().commits
    a_keys = [k for k in commits if k.startswith("epoch=a:")]
    b_keys = [k for k in commits if k.startswith("epoch=b:")]
    assert len(a_keys) >= 2 and len(b_keys) >= 2, sorted(commits)

    # redelivery: writer A re-runs its whole shard from a FRESH
    # checkpoint — every epoch no-ops on its recorded key, state holds
    v_before = t.current().version
    qr = run_stream(
        spark, wal_a, root, os.path.join(base, "ck_a2"), n_buckets=8,
        writer_id="a", record_metrics=False,
    )
    assert qr.awaitTermination(600)
    assert _state(t) == want
    assert t.current().version == v_before  # pure no-ops, no new commits


def test_recover_head_finishes_a_crashed_swap(spark):
    """A writer that crashed between version-file creation and the
    pointer swap leaves a complete orphan snapshot that BLOCKS its
    version (loud stall, no silent loss); recover_head adopts it."""

    from data_pipeline_spark.lake.table import (
        SNAPSHOT_DIR, ConcurrentCommitError, LakeTable, Snapshot,
    )

    base = tempfile.mkdtemp(prefix="mw_rec_")
    root = os.path.join(base, "tbl")
    t = ensure_table(spark, root, 4)
    log = cl.changelog(spark, SF_SMOKE).limit(50)
    from data_pipeline_spark.pipeline import apply_batch
    apply_batch(t, log, "e0", record_metrics=False)
    head = t.current()

    # simulate the crash window: next version's file exists, pointer not
    # swapped (content = a real committed-shape snapshot)
    orphan = Snapshot(**{**head.__dict__,
                         "version": head.version + 1,
                         "commits": {**head.commits,
                                     "crashed": head.version + 1}})
    with open(os.path.join(
            root, SNAPSHOT_DIR, f"v{orphan.version:08d}.json"), "w") as f:
        f.write(orphan.to_json())

    # a new commit at that version stalls loudly, never clobbers
    with pytest.raises(ConcurrentCommitError):
        t.commit_delta(
            t.read().limit(1).withColumn("lsn", F.col("lsn") + 10**9),
            "e1",
        )
    assert t.current().version == head.version  # untouched

    recovered = t.recover_head()
    assert recovered.version == orphan.version
    assert "crashed" in recovered.commits
    # and the blocked commit now lands on the adopted head
    t.commit_delta(
        t.read().limit(1).withColumn("lsn", F.col("lsn") + 10**9), "e1"
    )
    assert "e1" in t.current().commits
