"""Automatic schema-drift absorption (lake/merge.schema_drift /
absorb_schema_drift, merge_into(auto_evolve=), apply_batch(auto_evolve=),
run_stream(auto_evolve=)): the Delta mergeSchema / Debezium auto-evolution
shape — a batch carrying unknown columns or safely-widened types evolves
the table as a metadata-only commit instead of silently dropping them."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import (
    absorb_schema_drift,
    merge_into,
    schema_drift,
)
from data_pipeline_spark.lake.table import LakeTable

SCHEMA = [("url", "string"), ("lsn", "bigint"), ("v", "string")]


def _mk(spark, props=None):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_ae_"), SCHEMA, "url", 2,
        props=props,
    )


def _df(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_drift_detection_add_widen_and_incompatible(spark):
    t = _mk(spark)
    src = _df(spark, [("u", 1, "x", 7, "t/html")],
              "url string, lsn bigint, v string, score int, ct string")
    adds, widens = schema_drift(t, src)
    assert adds == {"score": "int", "ct": "string"} and widens == {}
    # widen: batch carries bigint where table holds int
    t2 = _mk(spark)
    t2.evolve_schema(add_columns={"n": "int"})
    adds, widens = schema_drift(
        t2, _df(spark, [("u", 1, "x", 5)], "url string, lsn bigint, v string, n bigint")
    )
    assert adds == {} and widens == {"n": "bigint"}
    # narrower source type: nothing to evolve (alignment casts up)
    adds, widens = schema_drift(
        t2, _df(spark, [("u", 1, "x", 5)], "url string, lsn bigint, v string, n smallint")
    )
    assert (adds, widens) == ({}, {})
    # incompatible drift refuses
    with pytest.raises(ValueError, match="incompatible schema drift"):
        schema_drift(
            t, _df(spark, [("u", "no", "x")], "url string, lsn string, v string")
        )


def test_merge_auto_evolve_and_silent_drop_without(spark):
    t = _mk(spark)
    b1 = _df(spark, [("u1", 1, "a", "insert")],
             "url string, lsn bigint, v string, op string")
    merge_into(t, b1, "c1")
    b2 = _df(spark, [("u2", 2, "b", "text/html", "insert")],
             "url string, lsn bigint, v string, ct string, op string")
    # default: unknown column silently dropped (documented alignment)
    merge_into(t, b2, "c2")
    assert "ct" not in [c for c, _ in t.schema_fields(t.current())]
    # auto_evolve: the column lands; pre-drift rows read NULL
    b3 = _df(spark, [("u3", 3, "c", "text/plain", "insert")],
             "url string, lsn bigint, v string, ct string, op string")
    merge_into(t, b3, "c3", auto_evolve=True)
    got = {r.url: r.ct for r in t.read().collect()}
    assert got == {"u1": None, "u2": None, "u3": "text/plain"}
    # replay of the same commit key (post-evolution) is a pure no-op
    v = t.current().version
    merge_into(t, b3, "c3", auto_evolve=True)
    assert t.current().version == v


def test_crash_between_evolve_and_merge_replays_clean(spark):
    t = _mk(spark)
    b = _df(spark, [("u", 1, "a", 9, "insert")],
            "url string, lsn bigint, v string, score bigint, op string")
    # simulate: evolution committed, data commit lost
    assert absorb_schema_drift(t, b, "c1~evolve") is not None
    v_evolved = t.current().version
    # redelivery: no remaining drift, merge lands, no duplicate evolution
    merge_into(t, b, "c1", auto_evolve=True)
    assert t.current().version == v_evolved + 1
    assert t.read().first()["score"] == 9


def test_auto_evolve_widen_preserves_old_values(spark):
    t = _mk(spark)
    t.evolve_schema(add_columns={"n": "int"})
    merge_into(t, _df(spark, [("u1", 1, "a", 5, "insert")],
                      "url string, lsn bigint, v string, n int, op string"), "c1")
    merge_into(t, _df(spark, [("u2", 2, "b", 2**40, "insert")],
                      "url string, lsn bigint, v string, n bigint, op string"),
               "c2", auto_evolve=True)
    assert dict(t.schema_fields(t.current()))["n"] == "bigint"
    got = {r.url: r.n for r in t.read().collect()}
    assert got == {"u1": 5, "u2": 2**40}


def test_compat_policy_still_governs(spark):
    t = _mk(spark, props={"schema.compat": "forward"})
    b = _df(spark, [("u", 1, "a", "x", "insert")],
            "url string, lsn bigint, v string, ct string, op string")
    # FORWARD needs an initial default for adds; auto-evolve can't invent
    # one, so the drift surfaces as the policy's loud refusal
    with pytest.raises(ValueError, match="initial DEFAULT"):
        merge_into(t, b, "c1", auto_evolve=True)


def test_stream_auto_evolve_mid_wal(spark, tmp_path):
    from data_pipeline_spark.streaming.pipeline import run_stream

    wal = str(tmp_path / "wal")
    ddl0 = ("url string, lsn bigint, warc_ts timestamp, op string, "
            "html binary, lang string")
    rows0 = [(f"http://a/{i}", i, None, "insert", b"<p>x</p>", "en")
             for i in range(8)]
    spark.createDataFrame(rows0, ddl0).coalesce(1).write.parquet(
        os.path.join(wal, "seg-00000"))
    # later segment carries a drift column
    rows1 = [(f"http://a/{i}", 100 + i, None, "upsert", b"<p>y</p>", "en",
              "text/html") for i in range(4)]
    spark.createDataFrame(rows1, ddl0 + ", content_type string").coalesce(
        1).write.parquet(os.path.join(wal, "seg-00001"))

    root = str(tmp_path / "tbl")
    q = run_stream(spark, wal, root, str(tmp_path / "ckpt"),
                   n_buckets=4, record_metrics=False, auto_evolve=True)
    q.awaitTermination()
    t = LakeTable(spark, root)
    assert "content_type" in dict(t.schema_fields(t.current()))
    got = {r.url: r.content_type for r in t.read().collect()}
    assert got[f"http://a/0"] == "text/html" and got[f"http://a/4"] is None
    assert len(got) == 8


def test_stream_auto_evolve_guards(spark, tmp_path):
    from data_pipeline_spark.streaming.pipeline import run_stream

    for kw, msg in [
        (dict(merge_mode="append"), "append merge-mode"),
        (dict(source_format="jsonl"), "self-describing"),
        (dict(reread_files=False), "file re-read"),
    ]:
        with pytest.raises(ValueError, match=msg):
            run_stream(spark, str(tmp_path / "w"), str(tmp_path / "t"),
                       str(tmp_path / "c"), auto_evolve=True, **kw)
