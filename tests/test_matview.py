"""Retract-stream changelog (changelog_rows) and incrementally-maintained
materialized views (matview.IncrementalView): the incremental fold must
equal a from-scratch recompute at every refresh point, survive epoch
redelivery without double-counting, and retract dead groups."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.matview import AggSpec, IncrementalView


def _mk(spark, n_buckets=4):
    root = tempfile.mkdtemp(prefix="lake_mv_")
    return LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("grp", "string"), ("val", "bigint")],
        "url", n_buckets,
    )


def _rows(spark, data):
    df = spark.createDataFrame(
        data, "url string, lsn bigint, warc_ts string, grp string, "
        "val bigint, op string"
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


TS = "2026-01-01 00:00:00"


def _mkview(spark, table):
    return IncrementalView(
        spark, table, tempfile.mkdtemp(prefix="mv_"),
        group_by=[("grp", "string", "grp")],
        aggs=[AggSpec("n_rows", "count"),
              AggSpec("val_sum", "sum", "val")],
        n_buckets=4,
    )


def _recompute(table):
    return {
        (r["grp"], r["n"], r["s"])
        for r in table.read()
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("val").alias("s"))
        .collect()
    }


def _state(view):
    return {
        (r["grp"], r["n_rows"], r["val_sum"])
        for r in view.read().collect()
    }


def test_changelog_rows_ops_and_images(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("u1", 1, TS, "a", 10, "upsert"),
        ("u2", 2, TS, "a", 20, "upsert"),
        ("u3", 3, TS, "b", 30, "upsert"),
    ]), "c1")
    merge_into(t, _rows(spark, [
        ("u1", 4, TS, "b", 11, "upsert"),   # update, group moves a -> b
        ("u2", 5, TS, "a", 20, "delete"),   # delete
        ("u4", 6, TS, "b", 40, "upsert"),   # insert
    ]), "c2")
    rows = {
        (r["url"], r["op"], r["lsn"], r["grp"], r["val"])
        for r in t.changelog_rows(1, 2).collect()
    }
    assert rows == {
        ("u1", "update_preimage", 1, "a", 10),
        ("u1", "update_postimage", 4, "b", 11),
        ("u2", "delete", 2, "a", 20),  # before-image payload, retraction
        ("u4", "insert", 6, "b", 40),
    }


def test_changelog_rows_folds_to_state_diff(spark):
    """Weighted-fold invariant over EVERY version interval: asserting
    (+1) post/insert images and retracting (-1) pre/delete images over
    changelog_rows(v0, v1) reproduces state(v1) - state(v0) for any
    distributive aggregate."""
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("u1", 1, TS, "a", 10, "upsert"),
        ("u2", 2, TS, "b", 20, "upsert"),
    ]), "c1")
    merge_into(t, _rows(spark, [
        ("u1", 3, TS, "a", 15, "upsert"),
        ("u3", 4, TS, "b", 30, "upsert"),
    ]), "c2")
    merge_into(t, _rows(spark, [
        ("u2", 5, TS, "b", 20, "delete"),
        ("u3", 6, TS, "c", 31, "upsert"),
    ]), "c3")

    def agg_state(snap_version):
        df = t.read_version(snap_version)
        return {
            (r["grp"], r["n"], r["s"]) for r in
            df.groupBy("grp").agg(F.count("*").alias("n"),
                                  F.sum("val").alias("s")).collect()
        }

    for v0 in range(0, 4):
        for v1 in range(v0 + 1, 4):
            w = F.when(
                F.col("op").isin("insert", "update_postimage"), F.lit(1)
            ).otherwise(F.lit(-1))
            folded = {
                (r["grp"], r["n"], r["s"])
                for r in t.changelog_rows(v0, v1)
                .select("grp", w.alias("w"), "val")
                .groupBy("grp")
                .agg(F.sum("w").alias("n"),
                     F.sum(F.col("w") * F.col("val")).alias("s"))
                .collect()
            }
            base = {g: (n, s) for g, n, s in agg_state(v0)}
            want = set()
            for g, n, s in agg_state(v1):
                bn, bs = base.pop(g, (0, 0))
                if (n - bn, s - bs) != (0, 0):
                    want.add((g, n - bn, s - bs))
            for g, (bn, bs) in base.items():
                want.add((g, -bn, -bs))
            assert folded == want, f"interval {v0}->{v1}"


def test_incremental_view_matches_recompute(spark):
    t = _mk(spark)
    view = _mkview(spark, t)
    merge_into(t, _rows(spark, [
        ("u1", 1, TS, "a", 10, "upsert"),
        ("u2", 2, TS, "a", 20, "upsert"),
        ("u3", 3, TS, "b", 30, "upsert"),
    ]), "c1")
    assert view.refresh() == 1
    assert _state(view) == _recompute(t) == {("a", 2, 30), ("b", 1, 30)}

    merge_into(t, _rows(spark, [
        ("u1", 4, TS, "b", 11, "upsert"),
        ("u4", 5, TS, "a", 5, "upsert"),
    ]), "c2")
    merge_into(t, _rows(spark, [
        ("u2", 6, TS, "a", 20, "delete"),
    ]), "c3")
    # one epoch per source commit
    assert view.refresh(max_versions_per_epoch=1) == 2
    assert _state(view) == _recompute(t)
    assert view.source_version() == t.current().version


def test_refresh_is_idempotent_and_redelivery_safe(spark):
    t = _mk(spark)
    view = _mkview(spark, t)
    merge_into(t, _rows(spark, [
        ("u1", 1, TS, "a", 10, "upsert"),
        ("u2", 2, TS, "b", 20, "upsert"),
    ]), "c1")
    assert view.refresh() == 1
    before = _state(view)
    # no new source commits -> no epochs
    assert view.refresh() == 0
    # crash-redelivery of an already-committed epoch interval must no-op
    # BEFORE any delta math (double-fold would double-count)
    view._apply_epoch(0, t.current().version)
    assert _state(view) == before


def test_group_death_is_retracted(spark):
    t = _mk(spark)
    view = _mkview(spark, t)
    merge_into(t, _rows(spark, [
        ("u1", 1, TS, "a", 10, "upsert"),
        ("u2", 2, TS, "b", 20, "upsert"),
    ]), "c1")
    view.refresh()
    merge_into(t, _rows(spark, [
        ("u1", 3, TS, "a", 10, "delete"),
    ]), "c2")
    view.refresh()
    assert _state(view) == {("b", 1, 20)}
    # group resurrects after death: insert with a newer lsn beats the
    # view-row tombstone fence
    merge_into(t, _rows(spark, [
        ("u9", 4, TS, "a", 7, "upsert"),
    ]), "c3")
    view.refresh()
    assert _state(view) == _recompute(t) == {("a", 1, 7), ("b", 1, 20)}


def test_minmax_with_dirty_group_recompute(spark):
    """min/max under retraction: epochs that retract the stored extremum
    re-derive just those groups from the source snapshot; all others fold
    incrementally. Covers extremum retraction, a duplicated extremum,
    group move, new group, and group death+rebirth."""
    t = _mk(spark)
    view = IncrementalView(
        spark, t, tempfile.mkdtemp(prefix="mv_mm_"),
        group_by=[("grp", "string", "grp")],
        aggs=[AggSpec("n_rows", "count"),
              AggSpec("v_max", "max", "val"),
              AggSpec("v_min", "min", "val")],
        n_buckets=4,
    )

    def check():
        got = {
            (r["grp"], r["n_rows"], r["v_max"], r["v_min"])
            for r in view.read().collect()
        }
        want = {
            (r["grp"], r["n"], r["mx"], r["mn"])
            for r in t.read().groupBy("grp").agg(
                F.count("*").alias("n"), F.max("val").alias("mx"),
                F.min("val").alias("mn")).collect()
        }
        assert got == want, (got, want)

    merge_into(t, _rows(spark, [
        ("u1", 1, TS, "a", 10, "upsert"),
        ("u2", 2, TS, "a", 30, "upsert"),   # a's max
        ("u3", 3, TS, "a", 30, "upsert"),   # duplicated extremum
        ("u4", 4, TS, "b", 7, "upsert"),
    ]), "c1")
    view.refresh()
    check()
    # retract ONE copy of the duplicated max: recompute must keep 30
    merge_into(t, _rows(spark, [("u2", 5, TS, "a", 30, "delete")]), "c2")
    view.refresh()
    check()
    # retract the last copy: max falls back to the runner-up
    merge_into(t, _rows(spark, [("u3", 6, TS, "a", 30, "delete")]), "c3")
    view.refresh()
    check()
    # non-extremum insert folds without any recompute; min retraction via
    # group move (u1 takes its value 10 from a to b)
    merge_into(t, _rows(spark, [
        ("u5", 7, TS, "a", 20, "upsert"),
        ("u1", 8, TS, "b", 10, "upsert"),
    ]), "c4")
    view.refresh()
    check()
    # group death then rebirth with a fresh extremum
    merge_into(t, _rows(spark, [("u4", 9, TS, "b", 7, "delete"),
                                ("u1", 10, TS, "b", 10, "delete")]), "c5")
    merge_into(t, _rows(spark, [("u9", 11, TS, "b", 99, "upsert")]), "c6")
    view.refresh(max_versions_per_epoch=1)
    check()


def test_view_write_is_o_changed_groups(spark):
    """Scale invariant: an epoch touching one group writes O(changed
    groups) rows into the view, not O(groups) — untouched view buckets
    carry forward by manifest reference."""
    t = _mk(spark, n_buckets=8)
    view = _mkview(spark, t)
    merge_into(t, _rows(spark, [
        (f"u{i}", i + 1, TS, f"g{i % 6}", i, "upsert") for i in range(24)
    ]), "c1")
    view.refresh()
    manifests_before = dict(view.table.current().manifests)
    merge_into(t, _rows(spark, [
        ("u0", 100, TS, "g0", 999, "upsert"),
    ]), "c2")
    view.refresh()
    after = view.table.current()
    changed = {
        b for b in after.manifests
        if manifests_before.get(b) != after.manifests[b]
    }
    assert len(changed) == 1  # only g0's view bucket committed a delta
    assert _state(view) == _recompute(t)
