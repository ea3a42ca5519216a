"""DLQ redrive (pipeline.redrive_dlq): quarantined events re-identified
in the original WAL and re-processed through the live gates after the
cause is fixed — resolved events land and tombstone out of the DLQ,
still-violating events stay, the whole flow is redelivery-idempotent,
and the final state converges to the LWW collapse over admitted events."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark import constraints
from data_pipeline_spark.pipeline import (
    apply_batch,
    ensure_dlq,
    ensure_table,
    redrive_dlq,
)


def _wal(spark, rows):
    df = spark.createDataFrame(
        rows,
        "url string, lsn bigint, warc_ts string, html binary, "
        "lang string, op string",
    )
    return df.select(
        "url", "lsn", F.to_timestamp("warc_ts").alias("warc_ts"),
        "html", F.lit(None).cast("string").alias("text"), "lang", "op",
    )


def _mk(spark):
    table = ensure_table(spark, tempfile.mkdtemp(prefix="rd_main_"), 4)
    dlq = ensure_dlq(spark, tempfile.mkdtemp(prefix="rd_dlq_"), 4)
    return table, dlq


TS = "2024-01-01 00:00:00"


def test_redrive_after_constraint_drop_restores_lww_state(spark):
    table, dlq = _mk(spark)
    constraints.add_check(table, "lang_allowed", "lang <> 'xx'")
    wal = _wal(spark, [
        ("https://a/1", 1, TS, b"<body>old</body>", "en", "insert"),
        ("https://a/1", 2, TS, b"<body>new</body>", "xx", "update"),
        ("https://b/2", 3, TS, b"<body>b</body>", "xx", "insert"),
        ("https://c/3", 4, TS, b"<body>c</body>", "fr", "insert"),
    ])
    apply_batch(table, wal, "rd-0", dlq=dlq)
    assert {(r.url, r.lsn) for r in table.read().collect()} == {
        ("https://a/1", 1), ("https://c/3", 4),
    }
    assert dlq.read().count() == 2

    constraints.drop_check(table, "lang_allowed")
    out = redrive_dlq(table, dlq, wal, "rd-redrive")
    assert out == {"candidates": 2, "resolved": 2, "still_quarantined": 0}
    # final state == plain LWW over the whole WAL, as if never constrained
    assert {(r.url, r.lsn, r.lang) for r in table.read().collect()} == {
        ("https://a/1", 2, "xx"),
        ("https://b/2", 3, "xx"),
        ("https://c/3", 4, "fr"),
    }
    assert dlq.read().count() == 0  # resolved rows tombstoned out


def test_still_violating_rows_stay_quarantined(spark):
    table, dlq = _mk(spark)
    constraints.add_check(table, "lang_allowed", "lang <> 'xx'")
    constraints.add_check(table, "small", "octet_length(html) <= 20")
    wal = _wal(spark, [
        ("https://a/1", 1, TS, b"<body>a</body>", "xx", "insert"),
        ("https://b/2", 2, TS, b"x" * 50, "en", "insert"),
    ])
    apply_batch(table, wal, "rd-1", dlq=dlq)
    assert dlq.read().count() == 2

    constraints.drop_check(table, "lang_allowed")  # size check stays
    out = redrive_dlq(table, dlq, wal, "rd-1-redrive")
    assert out == {"candidates": 2, "resolved": 1, "still_quarantined": 1}
    assert {r.url for r in table.read().collect()} == {"https://a/1"}
    left = dlq.read().collect()
    assert [(r.url, r.reason) for r in left] == [
        ("https://b/2", "check:small")
    ]


def test_redrive_is_idempotent_and_resolved_rows_never_flap_back(spark):
    table, dlq = _mk(spark)
    constraints.add_check(table, "lang_allowed", "lang <> 'xx'")
    wal = _wal(spark, [
        ("https://a/1", 1, TS, b"<body>a</body>", "xx", "insert"),
    ])
    apply_batch(table, wal, "rd-2", dlq=dlq)
    constraints.drop_check(table, "lang_allowed")
    redrive_dlq(table, dlq, wal, "rd-2-redrive")
    v_main, v_dlq = table.current().version, dlq.current().version

    # exact re-run: both commits no-op on their keys
    out = redrive_dlq(table, dlq, wal, "rd-2-redrive")
    assert out["candidates"] == 0  # nothing live in the DLQ anymore
    assert table.current().version == v_main
    assert dlq.current().version == v_dlq

    # the same event content re-quarantining later (e.g. a buggy gate
    # flags it again) loses to the redrive tombstone: same content hash,
    # old lsn — the quarantine write is a no-op at read time
    from data_pipeline_spark.pipeline import quarantine

    quarantine(
        dlq,
        wal.withColumn("__reason", F.lit("check:lang_allowed")),
        "rd-2-replay",
    )
    assert dlq.read().count() == 0


def test_reason_filter_and_structural_rows_excluded(spark):
    table, dlq = _mk(spark)
    constraints.add_check(table, "lang_allowed", "lang <> 'xx'")
    wal = _wal(spark, [
        ("https://a/1", 1, TS, b"<body>a</body>", "xx", "insert"),
        (None, 2, TS, b"<body>n</body>", "en", "insert"),  # null_key
        ("https://b/2", 3, TS, b"<body>b</body>", "xx", "insert"),
    ])
    apply_batch(table, wal, "rd-3", dlq=dlq)
    assert dlq.read().count() == 3
    constraints.drop_check(table, "lang_allowed")

    out = redrive_dlq(
        table, dlq, wal, "rd-3-redrive", reasons=["check:lang_allowed"]
    )
    assert out == {"candidates": 2, "resolved": 2, "still_quarantined": 0}
    # the null_key row was never a candidate and stays for forensics
    left = dlq.read().collect()
    assert len(left) == 1 and left[0].reason == "null_key"
