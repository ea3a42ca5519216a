"""Multi-table transactions: both tables or neither — including crash
recovery on either side of the manifest commit point."""

import os
import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.lake.txn import (
    MultiTableTransaction,
    recover_transactions,
)


def _mk(spark):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_txn_"),
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("v", "string")],
        "url", 4,
    )


def _rows(spark, data):
    df = spark.createDataFrame(
        data, "url string, lsn bigint, warc_ts string, v string, op string"
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


TS = "2026-01-01 00:00:00"


def _state(t):
    return {(r["url"], r["v"]) for r in t.read().collect()}


def test_commit_publishes_all_participants(spark):
    t1, t2 = _mk(spark), _mk(spark)
    txn = MultiTableTransaction(tempfile.mkdtemp(prefix="txn_"))
    txn.stage(t1, _rows(spark, [("u1", 1, TS, "a", "upsert")]), "e1")
    txn.stage(t2, _rows(spark, [("u2", 2, TS, "b", "upsert")]), "e1")
    assert _state(t1) == set() and _state(t2) == set()
    txn.commit()
    assert _state(t1) == {("u1", "a")} and _state(t2) == {("u2", "b")}


def test_abort_leaves_both_untouched(spark):
    t1, t2 = _mk(spark), _mk(spark)
    txn = MultiTableTransaction(tempfile.mkdtemp(prefix="txn_"))
    txn.stage(t1, _rows(spark, [("u1", 1, TS, "a", "upsert")]), "e1")
    txn.stage(t2, _rows(spark, [("u2", 2, TS, "b", "upsert")]), "e1")
    txn.abort()
    assert _state(t1) == set() and _state(t2) == set()
    assert t1.staged_snapshots() == {} and t2.staged_snapshots() == {}
    t1.vacuum()  # aborted files are reclaimable orphans


def test_crash_after_commit_point_recovers_to_all(spark):
    """Manifest written, only the FIRST participant published, then
    crash: recovery must finish the second publish."""
    t1, t2 = _mk(spark), _mk(spark)
    txn_dir = tempfile.mkdtemp(prefix="txn_")
    txn = MultiTableTransaction(txn_dir)
    txn.stage(t1, _rows(spark, [("u1", 1, TS, "a", "upsert")]), "e1")
    txn.stage(t2, _rows(spark, [("u2", 2, TS, "b", "upsert")]), "e1")
    orig = LakeTable.publish_staged
    calls = {"n": 0}

    def crashing(self, sid):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash mid-publish")
        return orig(self, sid)

    LakeTable.publish_staged = crashing
    try:
        try:
            txn.commit()
        except OSError:
            pass
    finally:
        LakeTable.publish_staged = orig
    assert _state(t1) == {("u1", "a")} and _state(t2) == set()
    res = recover_transactions(spark, txn_dir)
    assert res == {txn.txn_id: "finished"}
    assert _state(t2) == {("u2", "b")}
    # recovery is idempotent
    assert recover_transactions(spark, txn_dir) == {
        txn.txn_id: "already_committed"
    }


def test_crash_before_commit_point_publishes_nothing(spark):
    t1, t2 = _mk(spark), _mk(spark)
    txn_dir = tempfile.mkdtemp(prefix="txn_")
    txn = MultiTableTransaction(txn_dir)
    txn.stage(t1, _rows(spark, [("u1", 1, TS, "a", "upsert")]), "e1")
    txn.stage(t2, _rows(spark, [("u2", 2, TS, "b", "upsert")]), "e1")
    # crash here: no manifest was ever written
    assert recover_transactions(spark, txn_dir) == {}
    assert _state(t1) == set() and _state(t2) == set()
    assert os.listdir(txn_dir) == []


def test_read_consistent_pins_txn_versions(spark):
    import tempfile as _tf

    import pytest as _pt
    from pyspark.sql import functions as _F

    from data_pipeline_spark.lake.txn import (
        MultiTableTransaction,
        read_consistent,
    )
    from data_pipeline_spark.pipeline import ensure_table as _ensure
    from data_pipeline_spark.lake.merge import merge_into as _merge

    def _b(rows):
        df = spark.createDataFrame(
            rows, "url string, lsn bigint, warc_ts string, html binary, "
            "lang string, op string"
        )
        return df.select(
            "url", "lsn", _F.to_timestamp("warc_ts").alias("warc_ts"),
            "html", _F.lit(None).cast("string").alias("text"), "lang", "op",
        )

    a = _ensure(spark, _tf.mkdtemp(prefix="txr_a_"), 2)
    b = _ensure(spark, _tf.mkdtemp(prefix="txr_b_"), 2)
    txn_dir = _tf.mkdtemp(prefix="txr_d_")
    txn = MultiTableTransaction(txn_dir)
    txn.stage(a, _b([("u1", 1, "2024-01-01 00:00:00", b"x", "en", "insert")]), "a0")
    txn.stage(b, _b([("v1", 1, "2024-01-01 00:00:00", b"y", "de", "insert")]), "b0")
    txn.commit()

    # later single-table writes move the heads past the txn versions
    _merge(a, _b([("u2", 2, "2024-01-02 00:00:00", b"z", "en", "insert")]), "a1")
    view = read_consistent(spark, txn_dir, txn.txn_id)
    assert sorted(view) == sorted([a.root, b.root])
    assert [r.url for r in view[a.root].collect()] == ["u1"]  # pinned pre-a1
    assert [r.url for r in view[b.root].collect()] == ["v1"]
    assert a.read().count() == 2  # live head unaffected

    # unknown txn id refuses; a committing-state manifest refuses too
    import json as _json
    import os as _os

    with _pt.raises(FileNotFoundError):
        read_consistent(spark, txn_dir, "nonexistent")
    with open(_os.path.join(txn_dir, f"txn-{txn.txn_id}.json")) as f:
        man = _json.load(f)
    man["state"] = "committing"
    with open(_os.path.join(txn_dir, "txn-inflight.json"), "w") as f:
        _json.dump({**man, "txn_id": "inflight"}, f)
    with _pt.raises(RuntimeError, match="recover_transactions"):
        read_consistent(spark, txn_dir, "inflight")


def test_whole_transaction_replay_is_a_noop(spark):
    """Re-running an identical transaction after a successful earlier
    run must no-op end to end: the replayed stage() calls dedupe on
    their commit keys WITHOUT creating staged snapshots, and commit()
    must record those participants at their already-published versions
    instead of crashing on the absent staged files (exactly-once at the
    transaction boundary)."""
    t1, t2 = _mk(spark), _mk(spark)
    tdir = tempfile.mkdtemp(prefix="txn_")
    txn = MultiTableTransaction(tdir)
    txn.stage(t1, _rows(spark, [("u1", 1, TS, "a", "upsert")]), "e1")
    txn.stage(t2, _rows(spark, [("u2", 2, TS, "b", "upsert")]), "e1")
    txn.commit()
    v1, v2 = t1.current().version, t2.current().version

    replay = MultiTableTransaction(tdir)
    replay.stage(t1, _rows(spark, [("u1", 1, TS, "a", "upsert")]), "e1")
    replay.stage(t2, _rows(spark, [("u2", 2, TS, "b", "upsert")]), "e1")
    replay.commit()  # must not raise FileNotFoundError
    assert t1.current().version == v1 and t2.current().version == v2
    assert _state(t1) == {("u1", "a")} and _state(t2) == {("u2", "b")}
    # and the replay manifest pins the same published versions
    import json

    manifests = sorted(
        fn for fn in os.listdir(tdir)
        if fn.startswith("txn-") and fn.endswith(".json")
    )
    with open(os.path.join(tdir, f"txn-{replay.txn_id}.json")) as f:
        man = json.load(f)
    assert man["state"] == "committed"
    assert {p["version"] for p in man["participants"]} == {v1, v2}
