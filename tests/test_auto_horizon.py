"""Watermark-derived fold-compaction horizon (round-4): the stream arms
``stream.low_watermark`` via ``apply_append_batch(order_lateness=)``,
``compact_append(horizon="auto")`` consumes it, and the apply path
enforces it against sub-watermark stragglers — the caller no longer owns
the "no future event ≤ horizon" soundness contract by hand."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.maintenance import (
    MaintenancePolicy,
    compact_append,
    run_maintenance,
)
from data_pipeline_spark.operators import partial_update
from data_pipeline_spark.pipeline import apply_append_batch, ensure_dlq

DDL = "url string, lsn bigint, warc_ts timestamp, op string, a string, b string"
FIELDS = [
    ("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
    ("op", "string"), ("a", "string"), ("b", "string"),
]
TS = __import__("datetime").datetime(2026, 1, 1)


def _mk(spark, prefix="lake_autoh_"):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix=prefix), FIELDS, "url", 4,
        props={"merge.mode": "patch", "merge.patch.cols": ["a", "b"]},
    )


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, l, TS, op, a, b) for (u, l, op, a, b) in rows], DDL
    )


def _state(t):
    out = partial_update.partial_update_collapse(
        t.read(raw=True), "url", "lsn", ["a", "b"]
    )
    return {r["url"]: (r["lsn"], r["a"], r["b"]) for r in out.collect()}


EVENTS = [
    ("u", 1, "insert", "a1", "b1"),
    ("u", 2, "update", "a2", None),
    ("u", 5, "update", None, "b5"),
    ("v", 1, "insert", "av", "bv"),
    ("v", 3, "delete", None, None),
    ("w", 4, "insert", "aw", "bw"),
    ("w", 6, "update", None, "bw6"),
]


def test_stream_arms_monotonic_watermark_and_auto_fold_is_exact(spark):
    t = _mk(spark)
    apply_append_batch(
        t, _ev(spark, EVENTS[:5]), "e0", record_metrics=False,
        order_lateness=2,
    )
    assert t.current().props["stream.low_watermark"] == 3  # max 5 - 2
    apply_append_batch(
        t, _ev(spark, EVENTS[5:]), "e1", record_metrics=False,
        order_lateness=2,
    )
    assert t.current().props["stream.low_watermark"] == 4  # max 6 - 2
    # lateness larger than max never regresses the armed value
    apply_append_batch(
        t, _ev(spark, [("z", 5, "insert", "az", "bz")]), "e2",
        record_metrics=False, order_lateness=100,
    )
    assert t.current().props["stream.low_watermark"] == 4

    want = _state(t)
    n_raw = t.read(raw=True).count()
    snap = compact_append(t, "foldauto", horizon="auto", min_files=1)
    assert snap is not None and snap.summary["fold"] is True
    assert _state(t) == want  # fold is exact
    assert t.read(raw=True).count() < n_raw  # and actually folded


def test_auto_refuses_when_no_watermark_armed(spark):
    t = _mk(spark)
    apply_append_batch(t, _ev(spark, EVENTS[:3]), "e0", record_metrics=False)
    with pytest.raises(ValueError, match="low_watermark"):
        compact_append(t, "f0", horizon="auto", min_files=1)


def test_armed_watermark_refuses_or_quarantines_stragglers(spark):
    t = _mk(spark)
    apply_append_batch(
        t, _ev(spark, EVENTS), "e0", record_metrics=False, order_lateness=2
    )
    assert t.current().props["stream.low_watermark"] == 4
    # no DLQ: the batch refuses loudly (fold may already own lsn <= 4)
    with pytest.raises(ValueError, match="low_watermark"):
        apply_append_batch(
            t, _ev(spark, [("u", 3, "update", "late", None)]), "e1",
            record_metrics=False,
        )
    # with a DLQ: stragglers quarantine, fresh rows apply
    dlq = ensure_dlq(spark, tempfile.mkdtemp(prefix="dlq_autoh_"), 4)
    apply_append_batch(
        t,
        _ev(spark, [("u", 3, "update", "late", None),
                    ("u", 7, "update", "a7", None)]),
        "e2", record_metrics=False, dlq=dlq,
    )
    got = _state(t)
    assert got["u"] == (7, "a7", "b5")  # straggler's a='late' NOT applied
    q = dlq.read().collect()
    assert any(r["reason"] == "below_low_watermark" for r in q)


def test_scheduler_folds_at_auto_and_skips_unarmed(spark):
    # unarmed: the scheduled round must fall back to files-only, not crash
    t0 = _mk(spark, "lake_autoh0_")
    apply_append_batch(t0, _ev(spark, EVENTS[:3]), "e0", record_metrics=False)
    apply_append_batch(t0, _ev(spark, EVENTS[3:]), "e1", record_metrics=False)
    pol = MaintenancePolicy(
        max_files_per_bucket=1, fold_horizon="auto", max_delta_ratio=None
    )
    before = t0.read(raw=True).count()
    run_maintenance(t0, "m0", pol)
    assert t0.read(raw=True).count() == before  # files-only, no fold

    # armed: the same policy folds below the stream watermark
    t1 = _mk(spark, "lake_autoh1_")
    apply_append_batch(
        t1, _ev(spark, EVENTS[:5]), "e0", record_metrics=False,
        order_lateness=2,
    )
    apply_append_batch(
        t1, _ev(spark, EVENTS[5:]), "e1", record_metrics=False,
        order_lateness=2,
    )
    want = _state(t1)
    before = t1.read(raw=True).count()
    run_maintenance(t1, "m1", pol)
    assert _state(t1) == want
    assert t1.read(raw=True).count() < before  # folded events away


def test_null_order_rows_never_vanish_under_armed_watermark(spark):
    """ADVICE r4 (medium): with the watermark armed, a NULL-order row
    matched neither the late filter (order <= low) nor the keep filter
    (order > low) and silently vanished. Now: with a DLQ it quarantines
    at the contract gate (reason null_<order>, honoring a custom
    sequence.field — not the literal lsn); without one the batch refuses
    loudly. Either way, zero rows are lost."""
    # custom order column `rev` — no `lsn` anywhere in the schema
    fields = [
        ("url", "string"), ("rev", "bigint"), ("warc_ts", "timestamp"),
        ("op", "string"), ("a", "string"), ("b", "string"),
    ]
    ddl = ("url string, rev bigint, warc_ts timestamp, op string, "
           "a string, b string")
    t = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_nullord_"), fields, "url", 4,
        order_col="rev",
        props={"merge.mode": "patch", "merge.patch.cols": ["a", "b"]},
    )

    def ev(rows):
        return spark.createDataFrame(
            [(u, r, TS, op, a, b) for (u, r, op, a, b) in rows], ddl
        )

    apply_append_batch(
        t, ev([("u", 1, "insert", "a1", "b1"),
               ("u", 6, "update", "a6", None)]),
        "e0", record_metrics=False, order_lateness=2,
    )
    assert t.current().props["stream.low_watermark"] == 4

    # no DLQ: NULL-order row refuses the whole batch (not silent loss)
    with pytest.raises(ValueError, match="low_watermark"):
        apply_append_batch(
            t, ev([("v", None, "insert", "av", "bv")]),
            "e1", record_metrics=False,
        )

    # with a DLQ: NULL-order quarantines with the ORDER column's name in
    # the reason; the clean row in the same batch still applies
    dlq = ensure_dlq(spark, tempfile.mkdtemp(prefix="dlq_nullord_"), 4)
    apply_append_batch(
        t, ev([("v", None, "insert", "av", "bv"),
               ("w", 7, "insert", "aw", "bw")]),
        "e2", record_metrics=False, dlq=dlq,
    )
    out = partial_update.partial_update_collapse(
        t.read(raw=True), "url", "rev", ["a", "b"]
    )
    got = {r["url"] for r in out.collect()}
    assert got == {"u", "w"}  # v quarantined, w applied, nothing vanished
    reasons = {r["reason"] for r in dlq.read().collect()}
    assert "null_rev" in reasons
