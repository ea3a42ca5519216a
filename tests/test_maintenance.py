"""Retention sweep + backfill + mid-stream schema evolution."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.maintenance import backfill, retention_sweep
from data_pipeline_spark.pipeline import replay
from data_pipeline_spark.streaming.pipeline import run_stream, write_wal
from tests.conftest import SF_SMOKE


def _fresh(spark, n_buckets=8):
    root = tempfile.mkdtemp(prefix="lake_m_")
    return replay(spark, SF_SMOKE, root, n_batches=2, n_buckets=n_buckets,
                  record_metrics=False)


def test_retention_sweep_reconciles_and_deletes(spark):
    t = _fresh(spark)
    before = t.read().count()
    stats = retention_sweep(t, "sweep-1", retention_days=7)
    assert stats.applied
    assert sum(stats.gate_counts.values()) == before  # reconciliation
    after = t.read().count()
    assert after == stats.gate_counts.get("not_expired", 0)
    assert before - after == stats.gate_counts.get("delete", 0)
    # survivors are exactly the rows within retention of table-max warc_ts
    mx = t.read().agg(F.max("warc_ts")).first()[0]
    assert t.read().filter(
        F.col("warc_ts") + F.expr("INTERVAL 7 DAY") < F.lit(mx)
    ).count() == 0


def test_retention_sweep_idempotent_and_exclude(spark):
    t = _fresh(spark)
    excl = F.col("url").endswith("/page/0")
    n_excl = t.read().filter(excl).count()
    stats = retention_sweep(t, "sweep-1", retention_days=0, exclude=excl)
    # retention 0 deletes everything except the max-ts row(s) and excluded
    assert stats.gate_counts.get("excluded", 0) == n_excl
    v = t.current().version
    again = retention_sweep(t, "sweep-1", retention_days=0, exclude=excl)
    assert not again.applied and t.current().version == v


def test_backfill_after_schema_evolution(spark):
    """The T4 shape: evolve (add column) → backfill old rows → verify."""
    t = _fresh(spark)
    t.evolve_schema(add_columns={"expires": "timestamp"}, commit_key="evolve-1")
    assert t.read().filter(F.col("expires").isNotNull()).count() == 0
    assert backfill(
        t, "bf-1", {"expires": F.col("warc_ts") + F.expr("INTERVAL 30 DAY")}
    )
    rows = t.read().select("warc_ts", "expires").collect()
    assert rows and all(
        r.expires is not None and (r.expires - r.warc_ts).days == 30 for r in rows
    )
    # idempotent re-run
    assert not backfill(
        t, "bf-1", {"expires": F.lit(None).cast("timestamp")}
    )


def test_backfill_where_gate(spark):
    t = _fresh(spark)
    t.evolve_schema(add_columns={"tier": "string"})
    backfill(t, "bf-tier", {"tier": F.lit("hot")},
             where=F.col("lang") == "en")
    got = {r.lang: r.tier for r in t.read().select("lang", "tier").distinct().collect()}
    assert got.get("en") == "hot"
    assert all(v is None for k, v in got.items() if k != "en")


def test_mid_stream_schema_evolution(spark):
    """Evolve the schema BETWEEN streaming epochs: early epochs wrote v0
    rows, later epochs carry the new column; both coexist in one table
    (Iceberg add-column read semantics: old files yield typed NULLs)."""
    wal = tempfile.mkdtemp(prefix="wal_ev_")
    write_wal(spark, SF_SMOKE, wal, n_files=4)
    root = tempfile.mkdtemp(prefix="lake_ev_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_ev_")

    # drain first half
    q = run_stream(spark, wal, root, ckpt, n_buckets=8, record_metrics=False,
                   fail_after_batches=2, fail_mode="before")
    try:
        q.awaitTermination(180)
    except Exception:
        pass
    t = LakeTable(spark, root)
    assert len(t.current().commits) == 2

    # evolve mid-stream, then resume the tail
    t.evolve_schema(add_columns={"quality": "double"}, commit_key="evolve-q")
    q = run_stream(spark, wal, root, ckpt, n_buckets=8, record_metrics=False)
    q.awaitTermination(180)

    t = LakeTable(spark, root)
    assert len(t.current().commits) == 5  # 4 epochs + evolve
    out = t.read()
    assert "quality" in out.columns
    # all rows align to the evolved schema; pre-evolution rows read as NULL
    assert out.count() == out.select("url").distinct().count()
    # post-evolution backfill completes the migration
    backfill(t, "bf-q", {"quality": F.length("text").cast("double")})
    assert t.read().filter(F.col("quality").isNull()).count() == 0


def test_quality_gate(spark):
    from data_pipeline_spark import changelog as cl
    from data_pipeline_spark.maintenance import quality_gate

    log = cl.changelog(spark, SF_SMOKE)
    res = quality_gate(log)
    assert res["verdict"] == "PASS" and sum(res["failures"].values()) == 0

    dirty = log.unionByName(
        log.limit(3).withColumn("url", F.lit(None).cast("string"))
    )
    res = quality_gate(dirty)
    assert res["verdict"] == "FAIL"
    assert res["failures"]["null_or_empty_key"] == 3

    dup = log.unionByName(log.limit(5))
    res = quality_gate(dup)
    assert res["failures"]["duplicate_key_order"] == 5
    assert res["verdict"] == "FAIL"
    res = quality_gate(dup, max_fail_ratio=0.1)
    assert res["verdict"] == "WARN"


def test_files_metadata_table(spark):
    t = _fresh(spark)
    files = t.files()
    assert files.count() > 0
    total_rows = files.agg(F.sum("rows")).first()[0]
    # footer census == physical rows (pre-compaction: every key version
    # in the delta files, plus tombstones)
    assert total_rows == t.read(raw=True).count()
    assert total_rows >= t.read(include_tombstones=True).count()
    per_bucket = {r.bucket: r.n for r in files.groupBy("bucket").agg(F.sum("rows").alias("n")).collect()}
    snap = t.current()
    actual = {
        r.b: r.n
        for r in t.read(raw=True)
        .withColumn("b", t.bucket_expr(snap))
        .groupBy("b").agg(F.count("*").alias("n")).collect()
    }
    assert {k: v for k, v in per_bucket.items() if v} == {int(k): v for k, v in actual.items()}
    # after compaction: one base file per non-empty bucket, physical ==
    # logical(+tombstones), state unchanged
    before = sorted((r.url, r.lsn) for r in t.read().select("url", "lsn").collect())
    t.compact("compact-files-test")
    files2 = t.files()
    assert files2.filter(F.col("kind") == "delta").count() == 0
    assert files2.groupBy("bucket").count().agg(F.max("count")).first()[0] == 1
    assert files2.agg(F.sum("rows")).first()[0] == t.read(
        include_tombstones=True
    ).count()
    after = sorted((r.url, r.lsn) for r in t.read().select("url", "lsn").collect())
    assert after == before


def test_commit_log_and_flow_metrics(spark):
    """FIXTURES.md B3/B4: commit-log table rows per epoch, and the
    event-flow reconciliation invariant read == applied + deduped."""
    import tempfile as _tf

    from data_pipeline_spark import changelog as cl
    from data_pipeline_spark.metrics import read_metrics
    from data_pipeline_spark.pipeline import replay

    root = _tf.mkdtemp(prefix="lake_cl_")
    t = replay(spark, SF_SMOKE, root, n_batches=3, n_buckets=8)  # metrics ON
    clog = {r.commit_key: r.op for r in t.commit_log().collect()}
    assert set(clog) == {"replay-0", "replay-1", "replay-2"}
    assert all(op == "merge" for op in clog.values())

    commits = read_metrics(t, "commits")
    rows = commits.collect()
    assert len(rows) == 3
    total_read = 0
    for r in rows:
        assert r.events_read == r.events_applied + r.events_deduped, r
        assert r.deletes >= 0 and r.events_applied >= r.deletes
        total_read += r.events_read
    assert total_read == cl.changelog(spark, SF_SMOKE).count()


def test_watermark_late_drop(spark):
    """F3/B4: events older than the watermark floor are dropped before the
    collapse and counted; reconciliation extends to
    read == applied + deduped + late_dropped."""
    import tempfile as _tf

    from data_pipeline_spark import changelog as cl
    from data_pipeline_spark.metrics import read_metrics
    from data_pipeline_spark.pipeline import apply_batch, ensure_table

    log = cl.changelog(spark, SF_SMOKE)
    hi = log.agg(F.max("warc_ts")).first()[0]
    n_late = log.filter(
        F.col("warc_ts") < F.lit(hi) - F.expr("INTERVAL 3 DAY")
    ).count()
    assert n_late > 0  # the smoke log spans > 3 days

    root = _tf.mkdtemp(prefix="lake_wm_")
    t = ensure_table(spark, root, 8)
    apply_batch(t, log, "b0", watermark_days=3)
    m = read_metrics(t, "commits").collect()[0]
    assert m.events_late_dropped == n_late
    assert m.events_read == (
        m.events_applied + m.events_deduped + m.events_late_dropped
    )
    # nothing older than the floor landed in the table
    assert t.read().filter(
        F.col("warc_ts") < F.lit(hi) - F.expr("INTERVAL 3 DAY")
    ).count() == 0
