"""The table-as-change-feed source (streaming/table_feed.py): a mirror
built purely from feed epochs equals the source byte-for-byte, cursor
crash/redelivery is a no-op, backlog drains in bounded epochs, and
maintenance commits pass through as empty feeds."""

import os
import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.pipeline import apply_batch, ensure_table, replay
from data_pipeline_spark.streaming.table_feed import (
    follow_table,
    mirror_to,
    read_cursor,
    write_cursor,
)
from tests.conftest import SF_SMOKE


def _state(table):
    return sorted(
        (r.url, r.lsn, r.h)
        for r in table.read()
        .selectExpr("url", "lsn", "sha2(text, 256) AS h")
        .collect()
    )


def _tables(spark):
    src_root = tempfile.mkdtemp(prefix="feed_src_")
    mir_root = tempfile.mkdtemp(prefix="feed_mir_")
    replay(spark, SF_SMOKE, src_root, n_batches=3, n_buckets=8,
           record_metrics=False)
    src = ensure_table(spark, src_root, 8)
    mir = ensure_table(spark, mir_root, 8)
    return src, mir, tempfile.mkdtemp(prefix="feed_ckpt_")


def test_mirror_converges_to_source_state(spark):
    src, mir, ckpt = _tables(spark)
    epochs = mirror_to(src, mir, ckpt)
    assert epochs >= 1
    assert _state(mir) == _state(src)
    assert read_cursor(ckpt) == src.current().version
    # nothing new: zero epochs, state unchanged
    assert mirror_to(src, mir, ckpt) == 0


def test_incremental_epochs_and_backlog_chunking(spark):
    src, mir, ckpt = _tables(spark)
    # bounded bites: one commit per epoch
    epochs = mirror_to(src, mir, ckpt, max_versions_per_epoch=1)
    assert epochs == src.current().version - min(
        s.version for s in src.snapshot_log()
    )
    assert _state(mir) == _state(src)
    # a new source commit (update + delete) flows through the next drain
    sample = src.read().orderBy("url").limit(4)
    upd = sample.select("url", "lsn", "warc_ts", "html", "text", "lang") \
        .withColumn("lsn", F.col("lsn") + 10**9) \
        .withColumn("op", F.when(F.col("url") == sample.first()["url"],
                                 "delete").otherwise("update"))
    apply_batch(src, upd, "extra", record_metrics=False)
    assert mirror_to(src, mir, ckpt) == 1
    assert _state(mir) == _state(src)
    gone = sample.first()["url"]
    assert gone not in {u for u, _, _ in _state(mir)}


def test_crash_between_apply_and_cursor_redelivers_same_key(spark):
    """At-least-once delivery + idempotent consumer = exactly-once: roll
    the cursor back (as if the process died after apply, before the
    cursor write) and re-drain — the identical epoch key no-ops on the
    mirror's commit log and the state is unchanged."""
    src, mir, ckpt = _tables(spark)
    mirror_to(src, mir, ckpt)
    before = _state(mir)
    v_mir = mir.current().version
    # simulate the torn window: cursor back to the oldest version
    write_cursor(ckpt, min(s.version for s in src.snapshot_log()))
    mirror_to(src, mir, ckpt)
    assert mir.current().version == v_mir
    assert _state(mir) == before


def test_maintenance_commits_yield_empty_feed_but_advance_cursor(spark):
    src, mir, ckpt = _tables(spark)
    mirror_to(src, mir, ckpt)
    src.compact("c0")
    seen = []
    n = follow_table(src, ckpt, lambda df, k: seen.append(k))
    assert n == 1 and seen == []  # state-preserving commit: no feed rows
    assert read_cursor(ckpt) == src.current().version


def test_schema_evolution_propagates_to_mirror(spark):
    """Source evolves add-column mid-feed; the mirror evolves itself from
    the interval-end snapshot schema and converges, pre-evolution rows
    carrying typed NULLs in the new column on BOTH sides."""
    src, mir, ckpt = _tables(spark)
    mirror_to(src, mir, ckpt, max_versions_per_epoch=1)

    src.evolve_schema(add_columns={"fetch_status": "int"}, commit_key="ev")
    sample = src.read().orderBy("url").limit(3)
    upd = sample.select("url", "lsn", "warc_ts", "html", "text", "lang") \
        .withColumn("lsn", F.col("lsn") + 10**9) \
        .withColumn("fetch_status", F.lit(200)) \
        .withColumn("op", F.lit("update"))
    apply_batch(src, upd, "post-ev", record_metrics=False)

    mirror_to(src, mir, ckpt, max_versions_per_epoch=1)
    assert dict(mir.schema_fields(mir.current()))["fetch_status"] == "int"

    cols = ["url", "lsn", "lang", "fetch_status"]
    def full(t):
        return sorted(
            tuple(r[c] for c in cols)
            for r in t.read().select(*cols).collect()
        )
    assert full(mir) == full(src)
    touched = {r["url"] for r in upd.select("url").collect()}
    stat = {u: s for u, _, _, s in full(mir)}
    assert all(stat[u] == 200 for u in touched)
    assert all(s is None for u, s in stat.items() if u not in touched)

    # replay of the evolve epoch is a no-op on the mirror too
    v = mir.current().version
    write_cursor(ckpt, src.current().version - 1)
    mirror_to(src, mir, ckpt, max_versions_per_epoch=1)
    assert mir.current().version == v


def test_expired_cursor_recovers_via_resync_epoch(spark):
    """expire_snapshots past the cursor: the missed diffs are gone, but
    one resync epoch (current state + tombstones-as-deletes) converges
    the mirror exactly — including a delete the mirror never saw."""
    src, mir, ckpt = _tables(spark)
    mirror_to(src, mir, ckpt)

    # mirror goes dark; source keeps moving: an update batch and a delete
    sample = src.read().orderBy("url").limit(3)
    upd = sample.select("url", "lsn", "warc_ts", "html", "text", "lang") \
        .withColumn("lsn", F.col("lsn") + 10**9) \
        .withColumn("op", F.lit("update"))
    apply_batch(src, upd, "while-dark-1", record_metrics=False)
    victim = src.read().orderBy(F.desc("url")).limit(1)
    gone_url = victim.first()["url"]
    dele = victim.select("url", "lsn", "warc_ts", "html", "text", "lang") \
        .withColumn("lsn", F.col("lsn") + 10**9) \
        .withColumn("op", F.lit("delete"))
    apply_batch(src, dele, "while-dark-2", record_metrics=False)

    src.expire_snapshots(keep_last=1)
    src.vacuum()
    assert read_cursor(ckpt) < min(s.version for s in src.snapshot_log())

    n = mirror_to(src, mir, ckpt)
    assert n == 1
    assert _state(mir) == _state(src)
    assert gone_url not in {u for u, _, _ in _state(mir)}
    assert read_cursor(ckpt) == src.current().version
    # a later expired-cursor drain converges again
    write_cursor(ckpt, 0)
    src.expire_snapshots(keep_last=1)
    mirror_to(src, mir, ckpt)
    assert _state(mir) == _state(src)
