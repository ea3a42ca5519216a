"""Row lineage (lake/table.py LINEAGE_COL, read(with_lineage=True)):
Iceberg-v3-style row ids — ``_first_lsn`` is the order value at which a
key's current live incarnation first appeared; stable across updates,
reset by delete-then-reinsert, persisted through compaction and every
other rewrite path."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable

TS = "2026-01-01 00:00:00"
SCHEMA = [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
          ("v", "string")]


def _mk(spark, props=None):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_rl_"), SCHEMA, "url", 2,
        props={"lineage": "true", **(props or {})},
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, lsn bigint, warc_ts string, v string, op string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _lineage(t):
    return {
        r.url: (r.lsn, r._first_lsn)
        for r in t.read(with_lineage=True).collect()
    }


def test_stable_across_updates_reset_by_reinsert(spark):
    t = _mk(spark)
    merge_into(t, _batch(spark, [("u", 1, TS, "a", "insert")]), "c1")
    merge_into(t, _batch(spark, [("u", 5, TS, "b", "upsert")]), "c2")
    assert _lineage(t) == {"u": (5, 1)}
    merge_into(t, _batch(spark, [("u", 7, TS, None, "delete")]), "c3")
    merge_into(t, _batch(spark, [("u", 9, TS, "c", "insert")]), "c4")
    assert _lineage(t) == {"u": (9, 9)}
    # a later update keeps the new incarnation's id
    merge_into(t, _batch(spark, [("u", 12, TS, "d", "upsert")]), "c5")
    assert _lineage(t) == {"u": (12, 9)}


def test_compaction_persists_lineage(spark):
    t = _mk(spark)
    merge_into(t, _batch(spark, [("u", 1, TS, "a", "insert"),
                                 ("w", 2, TS, "x", "insert")]), "c1")
    merge_into(t, _batch(spark, [("u", 5, TS, "b", "upsert")]), "c2")
    merge_into(t, _batch(spark, [("w", 6, TS, None, "delete")]), "c3")
    merge_into(t, _batch(spark, [("w", 8, TS, "y", "insert")]), "c4")
    before = _lineage(t)
    t.compact(commit_key="k1")
    assert _lineage(t) == before == {"u": (5, 1), "w": (8, 8)}
    # post-compaction delta folds against the STORED base lineage
    merge_into(t, _batch(spark, [("u", 11, TS, "c", "upsert")]), "c5")
    assert _lineage(t)["u"] == (11, 1)
    t.compact(commit_key="k2")
    assert _lineage(t)["u"] == (11, 1)


def test_late_delete_is_canonical_order_boundary(spark):
    t = _mk(spark)
    merge_into(t, _batch(spark, [("u", 3, TS, "a", "insert")]), "c1")
    merge_into(t, _batch(spark, [("u", 9, TS, "b", "upsert")]), "c2")
    # late out-of-order delete BELOW the live row: it loses the LWW race
    # for FINAL STATE (u stays live at lsn 9) but in canonical lsn order
    # the history is insert@3 -> delete@5 -> upsert@9, so the current
    # incarnation starts at 9 — the same answer however the three events
    # are ordered across batches (order-independent lineage)
    merge_into(t, _batch(spark, [("u", 5, TS, None, "delete")]), "c3")
    assert _lineage(t) == {"u": (9, 9)}
    # ... and arrival in canonical order converges to the identical answer
    t2 = _mk(spark)
    merge_into(t2, _batch(spark, [("u", 3, TS, "a", "insert")]), "c1")
    merge_into(t2, _batch(spark, [("u", 5, TS, None, "delete")]), "c2")
    merge_into(t2, _batch(spark, [("u", 9, TS, "b", "upsert")]), "c3")
    assert _lineage(t2) == {"u": (9, 9)}


def test_requires_property(spark):
    t = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_rl_"), SCHEMA, "url", 2
    )
    merge_into(t, _batch(spark, [("u", 1, TS, "a", "insert")]), "c1")
    with pytest.raises(ValueError, match="lineage=true"):
        t.read(with_lineage=True)


def test_mid_life_enable_adopts_current_lsn(spark):
    t = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_rl_"), SCHEMA, "url", 2
    )
    merge_into(t, _batch(spark, [("u", 1, TS, "a", "insert")]), "c1")
    merge_into(t, _batch(spark, [("u", 4, TS, "b", "upsert")]), "c2")
    t.update_props({"lineage": "true"})
    # each pre-enable physical row adopts its OWN lsn; the fold takes the
    # min over the surviving history — 1, the true first sighting while
    # that history is still on disk
    assert _lineage(t) == {"u": (4, 1)}
    # compaction freezes whatever the fold sees at that moment
    t.compact(commit_key="k1")
    assert _lineage(t) == {"u": (4, 1)}


def test_projection_composes(spark):
    t = _mk(spark)
    merge_into(t, _batch(spark, [("u", 1, TS, "a", "insert")]), "c1")
    merge_into(t, _batch(spark, [("u", 6, TS, "b", "upsert")]), "c2")
    rows = t.read(columns=["v"], with_lineage=True).collect()
    assert rows[0]._first_lsn == 1 and rows[0].v == "b"
    assert set(rows[0].asDict()) == {"url", "lsn", "v", "_first_lsn"}


def test_retention_sweep_and_split_preserve_lineage(spark):
    from data_pipeline_spark.maintenance import retention_sweep

    t = _mk(spark)
    merge_into(t, _batch(spark, [("u", 1, "2026-01-05 00:00:00", "a", "insert"),
                                 ("old", 2, "2025-01-01 00:00:00", "x",
                                  "insert")]), "c1")
    merge_into(t, _batch(spark, [("u", 5, "2026-01-06 00:00:00", "b",
                                  "upsert")]), "c2")
    retention_sweep(t, "sweep-1", retention_days=14)
    assert _lineage(t) == {"u": (5, 1)}
    t.split_bucket(next(iter(range(t.current().n_buckets))), "split-1")
    assert _lineage(t) == {"u": (5, 1)}


def test_merge_mode_table_refuses(spark):
    t = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_rl_"),
        SCHEMA + [("op", "string")], "url", 2,
        props={"lineage": "true", "merge.mode": "patch",
               "merge.patch.cols": "v"},
    )
    assert not t.lineage_enabled()
    with pytest.raises(ValueError, match="lineage=true"):
        t.read(with_lineage=True)


def test_compacted_lineage_read_adds_no_exchange(spark):
    from data_pipeline_spark.lake.cojoin import assert_no_shuffle

    t = _mk(spark)
    merge_into(t, _batch(spark, [("u", 1, TS, "a", "insert"),
                                 ("w", 2, TS, "x", "insert")]), "c1")
    merge_into(t, _batch(spark, [("u", 5, TS, "b", "upsert")]), "c2")
    t.compact(commit_key="k1")
    # fully compacted: lineage is read straight from the persisted
    # column — no fence/min fold, no exchange anywhere in the plan
    assert_no_shuffle(t.read(with_lineage=True))
