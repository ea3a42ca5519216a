"""Dead-letter queue: contract violations route to the DLQ table instead
of failing the apply; the main table only ever sees clean events; the
same bad event quarantines exactly once across redeliveries; flow
counters reconcile with the quarantined term."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark import metrics as metrics_mod
from data_pipeline_spark.pipeline import apply_batch, ensure_dlq, ensure_table


def _batch(spark):
    rows = [
        # clean
        ("https://a/1", 1, "2024-01-01 00:00:00", b"<body>x</body>", "insert"),
        ("https://a/1", 2, "2024-01-02 00:00:00", b"<body>y</body>", "update"),
        ("https://b/2", 3, "2024-01-01 00:00:00", b"<body>z</body>", "insert"),
        # violations
        (None, 4, "2024-01-01 00:00:00", b"<body>n</body>", "insert"),
        ("https://c/3", None, "2024-01-01 00:00:00", b"<body>m</body>", "insert"),
        ("https://d/4", 5, "2024-01-01 00:00:00", b"<body>o</body>", "upsert"),
        ("https://e/5", 6, "2024-01-01 00:00:00", None, "update"),
        # delete without payload is CLEAN (deletes carry no html)
        ("https://b/2", 7, "2024-01-03 00:00:00", None, "delete"),
    ]
    df = spark.createDataFrame(
        rows, "url string, lsn bigint, warc_ts string, html binary, op string"
    )
    return df.select(
        "url", "lsn", F.to_timestamp("warc_ts").alias("warc_ts"),
        "html", F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"), "op",
    )


def _mk(spark):
    table = ensure_table(spark, tempfile.mkdtemp(prefix="dlq_main_"), 4)
    dlq = ensure_dlq(spark, tempfile.mkdtemp(prefix="dlq_dl_"), 4)
    return table, dlq


def test_violations_quarantined_and_main_clean(spark):
    table, dlq = _mk(spark)
    apply_batch(table, _batch(spark), "b0", dlq=dlq)

    got = {(r.url, r.lsn, r.reason) for r in dlq.read().collect()}
    assert got == {
        (None, 4, "null_key"),
        ("https://c/3", -1, "null_lsn"),
        ("https://d/4", 5, "bad_op"),
        ("https://e/5", 6, "null_payload"),
    }
    state = {(r.url, r.lsn) for r in table.read().collect()}
    # b/2 ends deleted (lsn 7 tombstone); a/1's winner is lsn 2.
    assert state == {("https://a/1", 2)}


def test_flow_counters_include_quarantined(spark):
    table, dlq = _mk(spark)
    apply_batch(table, _batch(spark), "b0", dlq=dlq)
    m = metrics_mod.read_metrics(table).collect()[0]
    assert m.events_quarantined == 4
    assert m.events_read == 8
    assert m.events_read == (
        m.events_applied + m.events_deduped
        + m.events_late_dropped + m.events_quarantined
    )


def test_redelivery_and_cross_epoch_dedup(spark):
    table, dlq = _mk(spark)
    apply_batch(table, _batch(spark), "b0", dlq=dlq)
    v_main = table.current().version
    v_dlq = dlq.current().version

    # Exact redelivery (same commit key): both tables no-op.
    apply_batch(table, _batch(spark), "b0", dlq=dlq)
    assert table.current().version == v_main
    assert dlq.current().version == v_dlq

    # Same bad events in a LATER epoch (new commit key): the DLQ commit
    # happens but content-hash keys collapse to the same 4 rows.
    apply_batch(table, _batch(spark), "b1", dlq=dlq)
    assert dlq.read().count() == 4


def test_clean_batch_skips_dlq_commit(spark):
    table, dlq = _mk(spark)
    clean = _batch(spark).filter(
        F.col("url").isNotNull() & F.col("lsn").isNotNull()
        & F.col("op").isin("insert", "update", "delete")
        & (F.col("html").isNotNull() | (F.col("op") == "delete"))
    )
    v0 = dlq.current().version
    apply_batch(table, clean, "b0", dlq=dlq)
    assert dlq.current().version == v0  # no empty quarantine commits
