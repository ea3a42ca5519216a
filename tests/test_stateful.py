"""applyInPandasWithState LWW gate: per-batch emission, cross-batch
suppression of stale/replayed events, checkpoint-backed state."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.streaming.pipeline import wal_stream, write_wal
from data_pipeline_spark.streaming.stateful import lww_gate_stream
from tests.conftest import SF_SMOKE


def test_lww_gate_emits_each_lsn_once_in_order(spark):
    wal = tempfile.mkdtemp(prefix="wal_st_")
    write_wal(spark, SF_SMOKE, wal, n_files=4)

    gated = lww_gate_stream(wal_stream(spark, wal, max_files_per_trigger=1))
    q = (
        gated.writeStream.format("memory")
        .queryName("gated_feed")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_st_"))
        .start()
    )
    q.awaitTermination(300)

    out = spark.table("gated_feed").collect()
    emitted = [(r.url, r.lsn) for r in out]
    # each (url, lsn) at most once
    assert len(emitted) == len(set(emitted))
    # WAL segments arrive in LSN order, so with ascending batches every
    # event is fresh exactly once: the gate passes the full log through
    n_events = cl.changelog(spark, SF_SMOKE).count()
    assert len(emitted) == n_events


def test_lww_gate_on_rocksdb_state_store(spark):
    """The RocksDB state store (the web-scale state backend: state spills
    to disk instead of executor heap) must run the same gate with the same
    output, including kill-and-resume through its checkpoint."""
    from data_pipeline_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        use_rocksdb_state_store,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    wal = tempfile.mkdtemp(prefix="wal_st3_")
    write_wal(spark, SF_SMOKE, wal, n_files=4)
    ckpt = tempfile.mkdtemp(prefix="ckpt_st3_")
    try:
        use_rocksdb_state_store(spark)
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )

        out_dir = tempfile.mkdtemp(prefix="out_st3_")

        def drain():
            q = (
                lww_gate_stream(wal_stream(spark, wal, max_files_per_trigger=1))
                .writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination(300)
            return [
                (r.url, r.lsn) for r in spark.read.parquet(out_dir).collect()
            ]

        first = drain()
        n_events = cl.changelog(spark, SF_SMOKE).count()
        assert len(first) == len(set(first)) == n_events
        # resume from the RocksDB-backed checkpoint: nothing re-emitted
        assert sorted(drain()) == sorted(first)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"
        )


def test_lww_gate_suppresses_replayed_segments(spark):
    """Re-delivering the first half of the WAL after the full drain (a
    reprocessing run with a fresh checkpoint but persisted state would do
    this) must emit nothing new for already-seen LSNs: model it by feeding
    files whose lsn ranges overlap."""
    wal = tempfile.mkdtemp(prefix="wal_st2_")
    # two segments with identical content: seg B replays seg A
    log = cl.changelog(spark, SF_SMOKE).filter(F.col("lsn") < 1000)
    import os

    log.coalesce(1).write.mode("overwrite").parquet(os.path.join(wal, "seg-a"))
    log.coalesce(1).write.mode("overwrite").parquet(os.path.join(wal, "seg-b"))

    gated = lww_gate_stream(wal_stream(spark, wal, max_files_per_trigger=1))
    q = (
        gated.writeStream.format("memory")
        .queryName("gated_replay")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_st2_"))
        .start()
    )
    q.awaitTermination(300)
    out = [(r.url, r.lsn) for r in spark.table("gated_replay").collect()]
    # the replayed copy contributed nothing: exactly the distinct events
    assert len(out) == len(set(out)) == log.count()
