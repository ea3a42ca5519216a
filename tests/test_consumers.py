"""Consumer registry (Paimon consumer-id analog): named incremental
readers pin snapshot retention so a lagging consumer resumes with
incremental diffs instead of the full-state resync epoch."""

import os

from data_pipeline_spark.pipeline import replay
from data_pipeline_spark.streaming.table_feed import (
    consumer_versions,
    drop_consumer,
    follow_table,
    register_consumer,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _table(spark, tmp_path, n_batches=4):
    return replay(
        spark, SF_DIR, str(tmp_path / "src"), n_batches=n_batches,
        n_buckets=8, record_metrics=False,
    )


def _drain(table, ckpt, consumer=None, sink=None):
    epochs = []

    def apply_fn(df, key):
        epochs.append(key)
        if sink is not None:
            sink.append(df.count())

    n = follow_table(
        table, ckpt, apply_fn, max_versions_per_epoch=1, consumer=consumer
    )
    return n, epochs


def test_consumer_registration_tracks_cursor(spark, tmp_path):
    t = _table(spark, tmp_path)
    _drain(t, str(tmp_path / "ckpt"), consumer="mirror-a")
    assert consumer_versions(t) == {"mirror-a": t.current().version}


def test_expiry_respects_lagging_consumer(spark, tmp_path):
    t = _table(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    # consumer delivered only up to an early version, then went away
    register_consumer(t, "laggard", 2)
    expired = t.expire_snapshots(keep_last=1)
    survivors = {s.version for s in t.snapshot_log()}
    assert all(v >= 2 for v in survivors) and 2 in survivors
    assert all(v < 2 for v in expired)
    # resume is INCREMENTAL: no resync epoch in the delivered keys
    from data_pipeline_spark.streaming.table_feed import write_cursor

    write_cursor(ckpt, 2)
    _n, epochs = _drain(t, ckpt, consumer="laggard")
    assert epochs and all("resync" not in k for k in epochs)
    assert consumer_versions(t)["laggard"] == t.current().version


def test_without_consumer_pin_expiry_forces_resync(spark, tmp_path):
    t = _table(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    from data_pipeline_spark.streaming.table_feed import write_cursor

    write_cursor(ckpt, 2)  # lagging reader that never registered
    t.expire_snapshots(keep_last=1)
    oldest = min(s.version for s in t.snapshot_log())
    assert oldest > 2
    _n, epochs = _drain(t, ckpt)
    assert len(epochs) == 1 and "resync" in epochs[0]


def test_drop_consumer_releases_the_pin(spark, tmp_path):
    t = _table(spark, tmp_path)
    register_consumer(t, "laggard", 2)
    assert drop_consumer(t, "laggard") is True
    assert drop_consumer(t, "laggard") is False
    t.expire_snapshots(keep_last=1)
    assert len(t.snapshot_log()) == 1


def test_respect_consumers_false_overrides(spark, tmp_path):
    t = _table(spark, tmp_path)
    register_consumer(t, "laggard", 2)
    t.expire_snapshots(keep_last=1, respect_consumers=False)
    assert len(t.snapshot_log()) == 1
