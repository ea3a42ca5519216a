"""Drop-column schema evolution, in-stream compaction cadence, and the
vacuum orphan-age guard."""

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable


def _mk(spark, n_buckets=4):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_ev_"),
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("v", "string"), ("extra", "string")],
        "url", n_buckets,
    )


def _rows(spark, data):
    df = spark.createDataFrame(
        data,
        "url string, lsn bigint, warc_ts string, v string, extra string, "
        "op string",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


TS = "2026-01-01 00:00:00"


def test_drop_column_disappears_everywhere(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "x1", "upsert")]), "c1")
    t.evolve_schema(drop_columns=["extra"], commit_key="evo-drop")
    assert "extra" not in t.read().columns
    # writes after the drop align to the narrowed schema
    merge_into(t, _rows(spark, [("u2", 2, TS, "b", "ignored", "upsert")]), "c2")
    got = {(r["url"], r["v"]) for r in t.read().collect()}
    assert got == {("u1", "a"), ("u2", "b")}
    # change feed across the drop boundary uses the newer (narrower) schema
    feed = t.changes_between(1, t.current().version)
    assert "extra" not in feed.columns
    # structural columns refuse
    with pytest.raises(ValueError):
        t.evolve_schema(drop_columns=["lsn"])
    with pytest.raises(KeyError):
        t.evolve_schema(drop_columns=["nope"])


def test_drop_then_compact_then_readd_starts_clean(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "old-value", "upsert")]), "c1")
    t.evolve_schema(drop_columns=["extra"], commit_key="e1")
    t.compact("k1")  # rewrites old files to the narrowed schema
    t.evolve_schema(add_columns={"extra": "string"}, commit_key="e2")
    vals = [r["extra"] for r in t.read().collect()]
    assert vals == [None]  # pre-drop bytes did not resurface


def test_stream_compaction_cadence(spark):
    from data_pipeline_spark import changelog as cl
    from data_pipeline_spark.operators.lww import last_writer_wins
    from data_pipeline_spark.streaming.pipeline import (
        stream_to_completion,
        write_wal,
    )
    from tests.conftest import SF_SMOKE

    wal_dir = tempfile.mkdtemp(prefix="wal_sc_")
    write_wal(spark, SF_SMOKE, wal_dir, n_files=4)
    table = stream_to_completion(
        spark, wal_dir, tempfile.mkdtemp(prefix="lake_sc_"),
        tempfile.mkdtemp(prefix="ck_sc_"),
        n_buckets=8, record_metrics=False, compact_every=2,
        compact_min_delta_ratio=None,
    )
    log = cl.changelog(spark, SF_SMOKE)
    expected = (
        last_writer_wins(log, "url", "lsn")
        .filter(F.col("op") != "delete")
        .count()
    )
    assert table.read().count() == expected
    ops = [s.summary.get("op") for s in table.snapshot_log()]
    assert ops.count("compact") == 2  # epochs 2 and 4 of 4
    # after the final compaction every bucket is delta-free
    kinds = {
        e.get("kind", "base")
        for es in table.all_entries(table.current()).values()
        for e in es
    }
    assert kinds == {"base"}


def test_vacuum_age_guard(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "x", "upsert")]), "c1")
    merge_into(
        t, _rows(spark, [("u2", 2, TS, "b", "x", "upsert")]), "c2",
        stage_id="young",
    )
    t.abort_staged("young")  # orphans just written seconds ago
    assert t.vacuum(min_age_s=3600) == 0  # age floor protects them
    assert t.vacuum(min_age_s=0.0) > 0
    assert {r["url"] for r in t.read().collect()} == {"u1"}


def test_backward_compat_policy_guards_drop(spark):
    import tempfile as _tf

    import pytest as _pt

    from data_pipeline_spark.pipeline import ensure_table as _ensure

    t = _ensure(spark, _tf.mkdtemp(prefix="compat_"), 2)
    t.update_props({"schema.compat": "backward"})
    t.evolve_schema(add_columns={"score": "bigint"})  # additive: allowed
    t.evolve_schema(widen={"score": "double"})        # widen: allowed
    with _pt.raises(ValueError, match="backward refuses drop"):
        t.evolve_schema(drop_columns=["score"])
    # explicit per-call override wins
    t.evolve_schema(drop_columns=["score"], compat="none")
    assert "score" not in dict(t.schema_fields(t.current()))


def test_forward_and_full_compat_policies(spark):
    import tempfile as _tf

    import pytest as _pt

    from data_pipeline_spark.pipeline import ensure_table as _ensure

    t = _ensure(spark, _tf.mkdtemp(prefix="compat_f_"), 2)
    t.update_props({"schema.compat": "forward"})
    # forward: adds need an initial default (new-schema readers over
    # pre-add files would otherwise see surprise NULLs)
    with _pt.raises(ValueError, match="forward requires an initial DEFAULT"):
        t.evolve_schema(add_columns={"score": "bigint"})
    t.evolve_schema(add_columns={"score": "bigint"}, defaults={"score": 0})
    t.evolve_schema(widen={"score": "double"})        # widen: allowed
    t.evolve_schema(rename_columns={"score": "pts"})  # forward allows rename
    t.evolve_schema(drop_columns=["pts"])             # and drop

    t.update_props({"schema.compat": "full"})
    with _pt.raises(ValueError, match="full requires an initial DEFAULT"):
        t.evolve_schema(add_columns={"n": "bigint"})
    t.evolve_schema(add_columns={"n": "bigint"}, defaults={"n": 1})
    with _pt.raises(ValueError, match="full refuses drop"):
        t.evolve_schema(drop_columns=["n"])
    with _pt.raises(ValueError, match="full refuses drop"):
        t.evolve_schema(rename_columns={"n": "m"})
    t.evolve_schema(drop_columns=["n"], compat="none")  # override wins
    with _pt.raises(ValueError, match="unknown compat"):
        t.evolve_schema(add_columns={"x": "int"}, compat="sideways")
