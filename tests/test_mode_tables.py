"""Table-level merge modes: a table declares its merge engine in props
(merge.mode + merge.patch.cols / merge.agg.spec, the Paimon
table-metadata shape), read() routes through the right collapse, and
the LWW-only operations refuse loudly instead of silently folding
events away."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.maintenance import compact_append
from data_pipeline_spark.operators.agg_merge import aggregate_collapse
from data_pipeline_spark.operators.partial_update import partial_update_collapse

PATCH_DDL = "url string, lsn bigint, op string, a string, b string"

EVENTS = [
    ("u", 1, "insert", "a1", "b1"),
    ("u", 2, "update", "a2", None),
    ("u", 3, "update", None, "b3"),
    ("v", 1, "insert", "av", "bv"),
    ("v", 2, "delete", None, None),
    ("w", 3, "update", None, "bw"),
]


def _mk(spark, props):
    root = tempfile.mkdtemp(prefix="lake_mode_")
    t = LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("op", "string"),
         ("a", "string"), ("b", "string")],
        "url", 4, props=props,
    )
    ev = spark.createDataFrame(EVENTS, PATCH_DDL)
    t.commit_delta(ev.filter(F.col("lsn") <= 2), "e0")
    t.commit_delta(ev.filter(F.col("lsn") > 2), "e1")
    return t, ev


def test_patch_mode_read_routes_through_collapse(spark):
    t, ev = _mk(spark, {"merge.mode": "patch",
                        "merge.patch.cols": ["a", "b"]})
    got = {r["url"]: (r["lsn"], r["a"], r["b"]) for r in t.read().collect()}
    want = {
        r["url"]: (r["lsn"], r["a"], r["b"])
        for r in partial_update_collapse(ev, "url", "lsn", ["a", "b"]).collect()
    }
    assert got == want == {"u": (3, "a2", "b3"), "w": (3, None, "bw")}


def test_patch_mode_read_survives_fold_compaction(spark):
    t, ev = _mk(spark, {"merge.mode": "patch",
                        "merge.patch.cols": ["a", "b"]})
    from data_pipeline_spark.operators.partial_update import fold_events

    compact_append(
        t, "fold",
        fold=lambda df: fold_events(df, "url", "lsn", ["a", "b"]),
        horizon=2, min_files=1,
    )
    got = {r["url"]: (r["lsn"], r["a"], r["b"]) for r in t.read().collect()}
    assert got == {"u": (3, "a2", "b3"), "w": (3, None, "bw")}


def test_patch_mode_point_read_and_projection(spark):
    t, _ = _mk(spark, {"merge.mode": "patch",
                       "merge.patch.cols": ["a", "b"]})
    pt = t.read(point_keys=["u"])
    assert [(r["url"], r["a"], r["b"]) for r in pt.collect()] == [
        ("u", "a2", "b3")
    ]
    proj = t.read(columns=["b"])
    assert sorted(proj.columns) == ["b", "lsn", "url"]
    assert {r["url"]: r["b"] for r in proj.collect()} == {
        "u": "b3", "w": "bw"
    }


def test_aggregate_mode_read(spark):
    spec = {"a": "count", "b": "last"}
    t, ev = _mk(spark, {"merge.mode": "aggregate", "merge.agg.spec": spec})
    got = {r["url"]: (r["lsn"], r["a"], r["b"]) for r in t.read().collect()}
    want = {
        r["url"]: (r["lsn"], r["a"], r["b"])
        for r in aggregate_collapse(ev, "url", "lsn", spec).collect()
    }
    assert got == want
    assert got["u"] == (3, 2, "b3")  # two non-null a patches, last b


def test_first_row_mode_read(spark):
    t, _ = _mk(spark, {"merge.mode": "first_row"})
    got = {r["url"]: (r["lsn"], r["a"], r["b"]) for r in t.read().collect()}
    assert got == {"u": (1, "a1", "b1"), "v": (1, "av", "bv")}


def test_props_derived_fold_compaction(spark):
    """compact_append(horizon=) with NO fold callable derives the fold
    kernel from the table's declared engine — and the collapsed read is
    unchanged by the fold."""
    t, _ = _mk(spark, {"merge.mode": "patch",
                       "merge.patch.cols": ["a", "b"]})
    before = {r["url"]: (r["lsn"], r["a"], r["b"]) for r in t.read().collect()}
    compact_append(t, "fold", horizon=2, min_files=1)
    after = {r["url"]: (r["lsn"], r["a"], r["b"]) for r in t.read().collect()}
    assert after == before == {"u": (3, "a2", "b3"), "w": (3, None, "bw")}


def test_props_derived_fold_refuses_undeclared(spark):
    t, _ = _mk(spark, {"merge.mode": "first_row"})
    with pytest.raises(ValueError, match="no props-derived fold"):
        compact_append(t, "fold", horizon=2, min_files=1)


def test_event_table_read_refuses_without_engine(spark):
    """An undeclared event store (merge.mode='event', the
    ensure_event_table default) has no sound collapse: non-raw read()
    refuses instead of silently LWW-folding event rows."""
    from data_pipeline_spark.pipeline import ensure_event_table

    root = tempfile.mkdtemp(prefix="lake_event_")
    t = ensure_event_table(spark, root, n_buckets=4)
    ev = spark.createDataFrame(
        [("u", 1, None, "insert", None, "en")],
        "url string, lsn bigint, warc_ts timestamp, op string, "
        "html binary, lang string",
    )
    t.commit_delta(ev, "e0")
    with pytest.raises(ValueError, match="raw=True"):
        t.read()
    assert t.read(raw=True).count() == 1


def test_lww_only_operations_refuse(spark):
    t, ev = _mk(spark, {"merge.mode": "patch",
                        "merge.patch.cols": ["a", "b"]})
    with pytest.raises(ValueError, match="compact_append"):
        t.compact("c0")
    with pytest.raises(ValueError, match="apply_append_batch"):
        merge_into(t, ev.limit(1), "m0")
    with pytest.raises(ValueError, match="collapsed_changelog"):
        t.changes_between(1, 2)
    with pytest.raises(ValueError, match="unsound"):
        t.read(min_order=1)
    # raw read still exposes the physical events for diagnostics
    assert t.read(raw=True).count() == len(EVENTS)
