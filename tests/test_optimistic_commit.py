"""Optimistic concurrent commits: a writer losing the snapshot CAS
rebases and retries when the interleaved commit touched disjoint buckets
(Iceberg's commit protocol); real conflicts still refuse."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import ConcurrentCommitError, LakeTable


def _mk(spark, n_buckets=4):
    root = tempfile.mkdtemp(prefix="lake_occ_")
    t = LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("v", "string")],
        "url", n_buckets,
    )
    return t, root


def _rows(spark, data):
    df = spark.createDataFrame(
        data, "url string, lsn bigint, warc_ts string, v string, op string"
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


TS = "2026-01-01 00:00:00"


def _urls_by_bucket(spark, t, n=30):
    snap = t.current()
    rows = spark.createDataFrame(
        [(f"u{i}",) for i in range(n)], "url string"
    ).select("url", t.bucket_expr(snap).alias("b")).collect()
    by = {}
    for r in rows:
        by.setdefault(int(r["b"]), []).append(r["url"])
    return by


def _race(t_victim, root, spark, interleaved_rows, interleaved_key):
    """Patch the victim handle so its first snapshot CAS is preceded by a
    commit from a second, independent handle on the same table — the
    deterministic two-writer interleave."""
    other = LakeTable(spark, root)
    orig = t_victim._write_snapshot
    state = {"fired": False}

    def hooked(snap, expect_parent):
        if not state["fired"]:
            state["fired"] = True
            merge_into(other, _rows(spark, interleaved_rows), interleaved_key)
        return orig(snap, expect_parent)

    t_victim._write_snapshot = hooked
    return state


def test_disjoint_buckets_rebase_and_both_land(spark):
    t, root = _mk(spark)
    by = _urls_by_bucket(spark, t)
    b1, b2 = sorted(by)[:2]
    u_mine, u_other = by[b1][0], by[b2][0]
    state = _race(
        t, root, spark, [(u_other, 2, TS, "theirs", "upsert")], "c-other"
    )
    merge_into(t, _rows(spark, [(u_mine, 1, TS, "mine", "upsert")]), "c-mine")
    assert state["fired"]
    head = LakeTable(spark, root).current()
    assert {"c-mine", "c-other"} <= set(head.commits)
    got = {
        (r["url"], r["v"])
        for r in LakeTable(spark, root).read().collect()
    }
    assert got == {(u_mine, "mine"), (u_other, "theirs")}


def test_same_bucket_conflict_refuses(spark):
    t, root = _mk(spark)
    by = _urls_by_bucket(spark, t)
    b1 = sorted(by)[0]
    u_mine, u_other = by[b1][0], by[b1][1]
    _race(t, root, spark, [(u_other, 2, TS, "theirs", "upsert")], "c-other")
    with pytest.raises(ConcurrentCommitError):
        merge_into(
            t, _rows(spark, [(u_mine, 1, TS, "mine", "upsert")]), "c-mine"
        )
    # the interleaved commit won; the refused one left no trace
    head = LakeTable(spark, root).current()
    assert "c-other" in head.commits and "c-mine" not in head.commits


def test_raced_same_commit_key_is_noop(spark):
    """Two workers replaying the SAME epoch: the loser discovers the key
    in the winner's commit map and returns the head — exactly-once."""
    t, root = _mk(spark)
    by = _urls_by_bucket(spark, t)
    u = by[sorted(by)[0]][0]
    rows = [(u, 1, TS, "x", "upsert")]
    _race(t, root, spark, rows, "epoch-7")
    stats = merge_into(t, _rows(spark, rows), "epoch-7")
    head = LakeTable(spark, root).current()
    assert head.commits["epoch-7"] == head.version
    assert [r["v"] for r in LakeTable(spark, root).read().collect()] == ["x"]
    assert stats.version == head.version


def test_schema_evolution_race_refuses(spark):
    t, root = _mk(spark)
    by = _urls_by_bucket(spark, t)
    b1, b2 = sorted(by)[:2]
    other = LakeTable(spark, root)
    orig = t._write_snapshot
    state = {"fired": False}

    def hooked(snap, expect_parent):
        if not state["fired"]:
            state["fired"] = True
            other.evolve_schema(
                add_columns={"extra": "string"}, commit_key="evo-1"
            )
        return orig(snap, expect_parent)

    t._write_snapshot = hooked
    with pytest.raises(ConcurrentCommitError):
        merge_into(
            t, _rows(spark, [(by[b1][0], 1, TS, "a", "upsert")]), "c-mine"
        )
