"""JoinView: incrementally-maintained fact ⋈ dim enrichment equals the
from-scratch join of CURRENT states through fact churn (insert / update
moving the join value / delete), dim churn (attribute update, dim-key
delete), both-sides epochs, and no-op epochs; refresh is cursor-idempotent."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.matview_join import JoinView
from data_pipeline_spark.pipeline import ensure_table

DIM_SCHEMA = [
    ("lang", "string"),
    ("lsn", "bigint"),
    ("tier", "bigint"),
    ("owner", "string"),
]


def _fact_batch(spark, rows):
    # rows: (url, lsn, lang, op)
    df = spark.createDataFrame(rows, "url string, lsn bigint, lang string, op string")
    return df.select(
        "url", "lsn",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("text"),
        "lang", "op",
    )


def _dim_batch(spark, rows):
    # rows: (lang, lsn, tier, owner, op)
    return spark.createDataFrame(
        rows, "lang string, lsn bigint, tier bigint, owner string, op string"
    )


def _mk(spark, how="inner"):
    fact = ensure_table(spark, tempfile.mkdtemp(prefix="jv_f_"), 4)
    dim = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="jv_d_"), DIM_SCHEMA, key="lang",
        n_buckets=4,
    )
    view = JoinView(
        spark, fact, dim, tempfile.mkdtemp(prefix="jv_v_"),
        join_expr="lang",
        fact_cols=[("src_lsn", "bigint", "lsn"), ("lang", "string", "lang")],
        dim_cols=["tier", "owner"],
        how=how,
        n_buckets=4,
        join_expr_cols=["lang"],
    )
    return fact, dim, view


def _expect(fact, dim, how):
    f = fact.read().select("url", F.col("lsn").alias("src_lsn"), "lang")
    d = dim.read().select("lang", "tier", "owner")
    j = f.join(d, "lang", how)
    return sorted(
        (r.url, r.src_lsn, r.lang, r.tier, r.owner) for r in j.collect()
    )


def _got(view):
    return sorted(
        (r.url, r.src_lsn, r.lang, r.tier, r.owner)
        for r in view.read().collect()
    )


def test_join_view_tracks_both_sides(spark):
    fact, dim, view = _mk(spark)
    merge_into(dim, _dim_batch(spark, [
        ("en", 1, 1, "org-a", "insert"),
        ("de", 2, 2, "org-b", "insert"),
        ("fr", 3, 3, "org-c", "insert"),
    ]), "d0")
    merge_into(fact, _fact_batch(spark, [
        ("u1", 1, "en", "insert"),
        ("u2", 2, "de", "insert"),
        ("u3", 3, "de", "insert"),
        ("u4", 4, "xx", "insert"),   # no dim match: absent from inner view
    ]), "f0")
    view.refresh()
    assert _got(view) == _expect(fact, dim, "inner")

    # fact epoch: u1 moves en->de (join value move), u2 deleted, u5 new
    merge_into(fact, _fact_batch(spark, [
        ("u1", 10, "de", "update"),
        ("u2", 11, None, "delete"),
        ("u5", 12, "fr", "insert"),
    ]), "f1")
    view.refresh()
    assert _got(view) == _expect(fact, dim, "inner")

    # dim epoch only: de's tier changes; fr deleted (u5's row must drop)
    merge_into(dim, _dim_batch(spark, [
        ("de", 10, 20, "org-b2", "update"),
        ("fr", 11, None, None, "delete"),
    ]), "d1")
    view.refresh()
    got = _got(view)
    assert got == _expect(fact, dim, "inner")
    assert all(t == 20 for (_, _, lang, t, _) in got if lang == "de")
    assert not any(lang == "fr" for (_, _, lang, _, _) in got)

    # both sides in one epoch
    merge_into(fact, _fact_batch(spark, [("u6", 20, "en", "insert")]), "f2")
    merge_into(dim, _dim_batch(spark, [("en", 20, 7, "org-a2", "update")]), "d2")
    view.refresh()
    assert _got(view) == _expect(fact, dim, "inner")


def test_left_join_keeps_unmatched_with_nulls(spark):
    fact, dim, view = _mk(spark, how="left")
    merge_into(dim, _dim_batch(spark, [("en", 1, 1, "org-a", "insert")]), "d0")
    merge_into(fact, _fact_batch(spark, [
        ("u1", 1, "en", "insert"),
        ("u2", 2, "zz", "insert"),
    ]), "f0")
    view.refresh()
    assert _got(view) == _expect(fact, dim, "left")
    # dim row for en vanishes: u1 stays with null dim payload
    merge_into(dim, _dim_batch(spark, [("en", 9, None, None, "delete")]), "d1")
    view.refresh()
    assert _got(view) == _expect(fact, dim, "left")
    assert len(_got(view)) == 2


def test_incremental_equals_fresh_rebuild_and_noop_epochs(spark):
    fact, dim, view = _mk(spark)
    merge_into(dim, _dim_batch(spark, [("en", 1, 1, "org-a", "insert")]), "d0")
    merge_into(fact, _fact_batch(spark, [("u1", 1, "en", "insert")]), "f0")
    view.refresh()
    merge_into(fact, _fact_batch(spark, [("u2", 5, "en", "insert")]), "f1")
    view.refresh()

    fresh = JoinView(
        spark, fact, dim, tempfile.mkdtemp(prefix="jv_fresh_"),
        join_expr="lang",
        fact_cols=[("src_lsn", "bigint", "lsn"), ("lang", "string", "lang")],
        dim_cols=["tier", "owner"],
        n_buckets=4,
    )
    fresh.refresh()
    assert _got(view) == _got(fresh) == _expect(fact, dim, "inner")

    # no new commits: refresh no-ops at the same cursors
    assert view.refresh() == view.cursors()

    # dim churn on a value no fact uses: cursors advance, view unchanged
    before = _got(view)
    merge_into(dim, _dim_batch(spark, [("ko", 30, 9, "org-k", "insert")]), "d1")
    view.refresh()
    assert view.cursors()[1] == dim.current().version
    assert _got(view) == before


def test_semi_join_scan_path_matches_point_path(spark):
    fact, dim, view = _mk(spark)
    merge_into(dim, _dim_batch(spark, [("en", 1, 1, "org-a", "insert")]), "d0")
    merge_into(fact, _fact_batch(spark, [
        (f"u{i}", i + 1, "en", "insert") for i in range(30)
    ]), "f0")
    view.refresh(max_point_keys=5)  # forces the semi-join scan route
    assert _got(view) == _expect(fact, dim, "inner")
