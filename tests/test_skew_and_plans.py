"""Skew operators + physical-plan quality assertions.

Plan checks pin the scale-critical properties the engine relies on:
filters and projections reach the parquet scan, small dims broadcast, and
the LWW hash aggregate keeps map-side partial aggregation (the skew
answer for the merge path)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.lake.merge import lww_collapse
from data_pipeline_spark.operators.lww import last_writer_wins
from data_pipeline_spark.operators.skew import (
    key_histogram,
    last_writer_wins_salted,
)
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_salted_lww_equals_plain(spark):
    log = cl.changelog(spark, SF_SMOKE)
    plain = {
        (r.url, r.lsn) for r in last_writer_wins(log).select("url", "lsn").collect()
    }
    salted = {
        (r.url, r.lsn)
        for r in last_writer_wins_salted(log, n_salts=8)
        .select("url", "lsn")
        .collect()
    }
    assert salted == plain


def test_changelog_is_skewed_and_histogram_sees_it(spark):
    """The synthetic log carries ~30% of events on 8 hot urls by design;
    the diagnostic must surface them."""
    log = cl.changelog(spark, SF_SMOKE)
    top = key_histogram(log, "url", top=8).collect()
    hot_share = sum(r.share for r in top)
    assert hot_share > 0.2, hot_share
    n_total = log.count()
    assert all(r.n > n_total / 1000 for r in top)


def test_lww_aggregate_has_partial_aggregation(spark):
    """The merge-path collapse must keep map-side combine (a
    partial_max_by BEFORE the exchange) — this is what makes hot urls
    unable to skew the exchange: each input partition ships at most one
    row per url, never 30% of the batch. (The wide struct buffer forces
    SortAggregate rather than HashAggregate; partial aggregation — the
    skew-relevant property — is present either way.)"""
    log = cl.changelog(spark, SF_SMOKE)
    cols = [c for c in log.columns if c != "url"]
    plan = _plan(lww_collapse(log, "url", "lsn", cols))
    assert "partial_max_by" in plan, plan
    ex = plan.index("Exchange")
    assert plan.index("partial_max_by") < plan.index("max_by(", ex), plan


def test_winner_selection_shuffles_narrow_and_combines_map_side(spark):
    """The apply path's winner agg must (a) carry ONLY (url, lsn) into its
    exchange — the wide html payload stays out of the shuffle — and
    (b) keep map-side partial aggregation (hot urls collapse locally)."""
    log = cl.changelog(spark, SF_SMOKE)
    winners = log.groupBy("url").agg(F.max("lsn").alias("lsn"))
    plan = _plan(winners)
    # the detail sections list nodes bottom-up: the partial aggregate's
    # detail must precede the exchange's (map-side combine BEFORE shuffle)
    assert "partial_max" in plan, plan
    assert plan.index("partial_max") < plan.index("hashpartitioning"), plan
    # the aggregate's input reads only url+lsn (column pruning to the scan)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "html" not in read_schema and "warc_ts" not in read_schema


def test_filter_and_projection_pushdown(spark):
    """Predicates and column pruning must reach the parquet scan."""
    df = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .filter(F.col("l_quantity") < 10)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity" in plan
    # ReadSchema carries only the two projected columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema


def test_small_dim_join_broadcasts(spark):
    """customer (small) joining orders must pick a broadcast join — no
    all-to-all shuffle of the fact side."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_changelog_scan_prunes_event_columns(spark):
    """The changelog projection must NOT read unused event columns
    (value/props stay out of ReadSchema)."""
    log = cl.changelog(spark, SF_SMOKE).select("url", "lsn", "op")
    plan = _plan(log)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "value" not in read_schema and "props" not in read_schema
