"""Conditional-clause MERGE (operators/merge_clauses.py): Delta-style
WHEN MATCHED AND ... THEN UPDATE SET / DELETE, WHEN NOT MATCHED INSERT,
composed over the merge-on-read event path."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.operators.merge_clauses import merge_when


def _mk(spark, n_buckets=4):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_mw_"),
        [("url", "string"), ("lsn", "bigint"), ("v", "string"),
         ("score", "bigint")],
        "url", n_buckets,
    )


def _rows(spark, data):
    return spark.createDataFrame(
        data, "url string, lsn bigint, v string, score bigint, op string"
    )


def _seed(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("a", 1, "a1", 10, "insert"),
        ("b", 1, "b1", 20, "insert"),
        ("c", 1, "c1", 30, "insert"),
    ]), "seed")
    return t


def test_update_delete_insert_clauses(spark):
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 5, "a2", 100), ("b", 5, "b2", 999), ("d", 5, "d1", 40)],
        "url string, lsn bigint, v string, score bigint",
    )
    merge_when(
        t, src, "m1",
        matched_update={"v": "s.v", "score": "t.score + s.score"},
        matched_update_cond="s.score < 500",
        matched_delete_cond="s.score >= 500",
    )
    got = {r["url"]: (r["lsn"], r["v"], r["score"])
           for r in t.read().collect()}
    assert got == {
        "a": (5, "a2", 110),   # update: SET mixes s.* and t.*
        "c": (1, "c1", 30),    # untouched (not in source)
        "d": (5, "d1", 40),    # not matched -> insert
    }
    assert "b" not in got      # delete clause won


def test_stale_source_rows_noop_and_idempotent_replay(spark):
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 1, "stale", 0), ("b", 7, "b2", 1)],
        "url string, lsn bigint, v string, score bigint",
    )
    merge_when(t, src, "m1", matched_update={"v": "s.v"})
    got = {r["url"]: r["v"] for r in t.read().collect()}
    # a's source lsn == target lsn -> implicit s.lsn > t.lsn gate no-ops it
    assert got == {"a": "a1", "b": "b2", "c": "c1"}
    # exact replay with different data is a commit-key no-op
    v = t.current().version
    merge_when(t, src.withColumn("v", F.lit("zz")), "m1",
               matched_update={"v": "s.v"})
    assert t.current().version == v


def test_no_clause_matches_leaves_row(spark):
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 9, "a2", 1), ("e", 9, "e1", 2)],
        "url string, lsn bigint, v string, score bigint",
    )
    merge_when(
        t, src, "m1",
        matched_update={"v": "s.v"}, matched_update_cond="s.score > 100",
        insert_not_matched=False,
    )
    got = {r["url"]: (r["lsn"], r["v"]) for r in t.read().collect()}
    # matched but condition false -> untouched; unmatched not inserted
    assert got == {"a": (1, "a1"), "b": (1, "b1"), "c": (1, "c1")}


def test_source_duplicates_collapse_and_guards(spark):
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 5, "old", 1), ("a", 6, "new", 2)],
        "url string, lsn bigint, v string, score bigint",
    )
    merge_when(t, src, "m1", matched_update={"v": "s.v"})
    assert {r["v"] for r in t.read().filter("url='a'").collect()} == {"new"}
    with pytest.raises(KeyError, match="not updatable"):
        merge_when(t, src, "m2", matched_update={"url": "s.url"})
    with pytest.raises(KeyError, match="must carry"):
        merge_when(t, src.drop("lsn"), "m3", matched_update={"v": "s.v"})


def test_matches_unconditional_merge_semantics(spark):
    """With the classic CDC clauses, merge_when == merge_into."""
    t1, t2 = _seed(spark), _seed(spark)
    batch = _rows(spark, [
        ("a", 5, "a2", 11, "update"),
        ("b", 5, None, None, "delete"),
        ("d", 5, "d1", 44, "insert"),
    ])
    merge_into(t1, batch, "m")
    merge_when(
        t2, batch.drop("op").withColumn(
            "is_del", F.col("v").isNull()
        ), "m",
        matched_update={"v": "s.v", "score": "s.score"},
        matched_update_cond="NOT s.is_del",
        matched_delete_cond="s.is_del",
    )
    a = sorted(map(tuple, t1.read().collect()))
    b = sorted(map(tuple, t2.read().collect()))
    assert a == b


def test_by_source_delete_makes_table_mirror_source(spark):
    """The snapshot-sync shape: matched update + unmatched insert +
    NOT MATCHED BY SOURCE DELETE leaves the table == the source."""
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 5, "a2", 11), ("d", 5, "d1", 44)],
        "url string, lsn bigint, v string, score bigint",
    )
    merge_when(
        t, src, "sync",
        matched_update={"v": "s.v", "score": "s.score"},
        by_source_delete_cond="true",
    )
    got = {r["url"]: (r["v"], r["score"]) for r in t.read().collect()}
    assert got == {"a": ("a2", 11), "d": ("d1", 44)}  # b, c deleted


def test_by_source_update_scope_and_precedence(spark):
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 5, "a2", 11)], "url string, lsn bigint, v string, score bigint"
    )
    merge_when(
        t, src, "m1",
        matched_update={"v": "s.v"},
        by_source_delete_cond="t.score >= 30",          # c deleted
        by_source_update={"v": "concat(t.v, '!stale')"},  # b marked
        by_source_scope="t.url <> 'zzz'",
    )
    got = {r["url"]: (r["lsn"], r["v"]) for r in t.read().collect()}
    # b's event advanced its own lsn by 1 (no source row to take it from)
    assert got == {"a": (5, "a2"), "b": (2, "b1!stale")}
    assert "c" not in got  # delete tried first


def test_by_source_scope_bounds_eligibility(spark):
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 5, "a2", 11)], "url string, lsn bigint, v string, score bigint"
    )
    merge_when(
        t, src, "m1",
        by_source_delete_cond="true",
        by_source_scope="t.url = 'b'",
        insert_not_matched=False,
    )
    got = {r["url"] for r in t.read().collect()}
    assert got == {"a", "c"}  # only b was in scope for the sweep


def test_by_source_event_loses_to_later_wal_event(spark):
    """The +1 order bump wins against the superseded row but still loses
    to a genuinely later WAL event for the same key."""
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 5, "a2", 11)], "url string, lsn bigint, v string, score bigint"
    )
    merge_when(t, src, "m1", by_source_update={"v": "'stale'"},
               insert_not_matched=False)
    assert {r["url"]: r["v"] for r in t.read().collect()} == {
        "a": "a1", "b": "stale", "c": "stale"}
    merge_into(t, _rows(spark, [("b", 9, "b9", 1, "update")]), "later")
    assert t.read().filter("url='b'").first()["v"] == "b9"


def test_by_source_delete_carries_before_image(spark):
    """A BY SOURCE DELETE coexisting with an UPDATE clause must tombstone
    with the target's before-image, not the UPDATE's SET values."""
    t = _seed(spark)
    v0 = t.current().version
    src = spark.createDataFrame(
        [("a", 5, "a2", 11)], "url string, lsn bigint, v string, score bigint"
    )
    merge_when(
        t, src, "m1",
        by_source_delete_cond="t.url = 'b'",
        by_source_update={"v": "'stale'"},
        insert_not_matched=False,
    )
    ch = {
        r["url"]: (r["op"], r["v"])
        for r in t.changes_between(v0, t.current().version).collect()
        if r["url"] == "b"
    }
    assert ch == {"b": ("delete", "b1")}


def test_by_source_guards(spark):
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 5, "a2", 11)], "url string, lsn bigint, v string, score bigint"
    )
    with pytest.raises(ValueError, match="only t..* references"):
        merge_when(t, src, "g1", by_source_delete_cond="s.score > 1")
    with pytest.raises(ValueError, match="need a BY SOURCE"):
        merge_when(t, src, "g2", by_source_scope="t.url <> 'x'")
    with pytest.raises(KeyError, match="not updatable"):
        merge_when(t, src, "g3", by_source_update={"url": "'x'"})
    # idempotent replay on the commit key
    merge_when(t, src, "m1", by_source_delete_cond="true")
    v = t.current().version
    merge_when(t, src, "m1", by_source_delete_cond="true")
    assert t.current().version == v
