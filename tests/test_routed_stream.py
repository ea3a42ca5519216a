"""Routed multi-table fan-out sync (streaming/routes.py): one WAL tailed
into N tables by predicate, each epoch all-or-nothing across the tables.

Reference analog: one polled change window fanned out to per-collection
pipelines, re-driven as a unit on failure
(scripts/watch_cdse_and_process.py:241-277)."""

import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.pipeline import replay_log
from data_pipeline_spark.streaming.pipeline import write_wal
from data_pipeline_spark.streaming.routes import (
    routed_stream_to_completion,
    run_routed_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

EVEN = "CAST(regexp_extract(url, 'site-([0-9]+)', 1) AS INT) % 2 = 0"
REST = f"NOT coalesce(({EVEN}), false)"


def _sorted_rows(df):
    return sorted(
        df.select("url", "lsn", "lang", F.sha2("text", 256).alias("sha"))
        .collect()
    )


def _drain(spark, wal, routes, ckpt, txn, **kw):
    q = run_routed_stream(
        spark, wal, routes, ckpt, txn, n_buckets=8, available_now=True, **kw
    )
    err = None
    try:
        q.awaitTermination(300)
    except Exception as e:  # injected failures surface here
        err = e
    finally:
        if q.isActive:
            q.stop()
    return err


def _solo(spark, pred, root, n_batches):
    log = cl.changelog(spark, SF_DIR).filter(F.expr(pred))
    return replay_log(
        spark, log, root, n_batches=n_batches, n_buckets=8,
        record_metrics=False,
    )


def test_routed_fanout_matches_filtered_replays(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(spark, SF_DIR, wal, n_files=3)
    tables = routed_stream_to_completion(
        spark,
        wal,
        {
            "even": (str(tmp_path / "t_even"), EVEN),
            "rest": (str(tmp_path / "t_rest"), None),
        },
        str(tmp_path / "ckpt"),
        str(tmp_path / "txn"),
        n_buckets=8,
    )
    for name, pred in [("even", EVEN), ("rest", REST)]:
        solo = _solo(spark, pred, str(tmp_path / f"solo_{name}"), 3)
        assert _sorted_rows(tables[name].read()) == _sorted_rows(solo.read())


def test_post_commit_double_fire_noops_across_all_tables(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(spark, SF_DIR, wal, n_files=4)
    routes = {
        "even": (str(tmp_path / "t_even"), EVEN),
        "rest": (str(tmp_path / "t_rest"), None),
    }
    ckpt, txn = str(tmp_path / "ckpt"), str(tmp_path / "txn")
    err = _drain(
        spark, wal, routes, ckpt, txn, fail_after_batches=2, fail_mode="after"
    )
    assert err is not None  # crashed between txn commit and checkpoint
    # epoch 2's transaction committed but the offset did not: restart
    # redelivers it; the per-table epoch keys make re-application a no-op.
    assert _drain(spark, wal, routes, ckpt, txn) is None
    tables = {n: LakeTable(spark, r) for n, (r, _p) in routes.items()}
    for name, pred in [("even", EVEN), ("rest", REST)]:
        solo = _solo(spark, pred, str(tmp_path / f"solo_{name}"), 4)
        assert _sorted_rows(tables[name].read()) == _sorted_rows(solo.read())
    # exactly-once at the commit level: each epoch key recorded once, at
    # one version (a double-application would have bumped it)
    for t in tables.values():
        epochs = [
            k for k in t.current().commits if k.startswith("epoch=")
        ]
        assert len(epochs) == len(set(epochs)) == 4


def test_crash_mid_publish_recovers_on_restart(spark, tmp_path, monkeypatch):
    """Crash BETWEEN the transaction commit point and the second table's
    publish: the epoch is decided — startup recovery must finish it."""
    wal = str(tmp_path / "wal")
    write_wal(spark, SF_DIR, wal, n_files=1)
    routes = {
        "even": (str(tmp_path / "t_even"), EVEN),
        "rest": (str(tmp_path / "t_rest"), None),
    }
    ckpt, txn = str(tmp_path / "ckpt"), str(tmp_path / "txn")
    real = LakeTable.publish_staged
    calls = {"n": 0}

    def bomb(self, stage_id):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash mid-publish")
        return real(self, stage_id)

    monkeypatch.setattr(LakeTable, "publish_staged", bomb)
    err = _drain(spark, wal, routes, ckpt, txn)
    assert err is not None and "mid-publish" in str(err)
    monkeypatch.setattr(LakeTable, "publish_staged", real)
    # One table published, the other not — restart recovery finishes the
    # decided transaction before new epochs run, then the redelivered
    # epoch no-ops.
    assert _drain(spark, wal, routes, ckpt, txn) is None
    tables = {n: LakeTable(spark, r) for n, (r, _p) in routes.items()}
    for name, pred in [("even", EVEN), ("rest", REST)]:
        solo = _solo(spark, pred, str(tmp_path / f"solo_{name}"), 1)
        assert _sorted_rows(tables[name].read()) == _sorted_rows(solo.read())


def test_mutable_routing_predicate_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="mutable payload"):
        run_routed_stream(
            spark, str(tmp_path / "wal"),
            {"en": (str(tmp_path / "t"), "lang = 'en'")},
            str(tmp_path / "ckpt"), str(tmp_path / "txn"),
        )


def test_unmatched_rows_stop_the_stream_loudly(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(spark, SF_DIR, wal, n_files=1)
    err = _drain(
        spark, wal,
        {"even": (str(tmp_path / "t_even"), EVEN)},
        str(tmp_path / "ckpt"), str(tmp_path / "txn"),
    )
    assert err is not None and "matched no route" in str(err)
    # and the partial route did NOT commit the poisoned epoch
    assert not LakeTable.exists(str(tmp_path / "t_even")) or not [
        k
        for k in LakeTable(spark, str(tmp_path / "t_even")).current().commits
        if k.startswith("epoch=")
    ]
