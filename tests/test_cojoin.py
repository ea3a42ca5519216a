"""Storage-partitioned (co-bucketed) join: result equals a plain join,
the plan carries no table-wide shuffle on compacted tables, layout
mismatches refuse, and left joins keep unmatched keys."""

import tempfile

from pyspark.sql import functions as F

import pytest

from data_pipeline_spark.lake.cojoin import assert_no_shuffle, cobucketed_join
from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable


def _mk(spark, fields, key="url", n_buckets=4, prefix="lake_cj_"):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix=prefix), fields, key, n_buckets
    )


def _state(spark, n=300):
    rows = [
        (f"https://site-{i % 5}.example/page/{i}", i + 1, f"l{i % 3}", "update")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "url string, lsn bigint, lang string, op string"
    )


def _profile(spark, n=300, only_even=False):
    rows = [
        (f"https://site-{i % 5}.example/page/{i}", 1, (i * 37) % 100)
        for i in range(n)
        if not only_even or i % 2 == 0
    ]
    return spark.createDataFrame(rows, "url string, lsn bigint, score bigint")


def _pair(spark, n_buckets=4, only_even=True):
    left = _mk(
        spark,
        [("url", "string"), ("lsn", "bigint"), ("lang", "string")],
        n_buckets=n_buckets,
    )
    right = _mk(
        spark,
        [("url", "string"), ("lsn", "bigint"), ("score", "bigint")],
        n_buckets=n_buckets,
    )
    merge_into(left, _state(spark), "l0")
    merge_into(
        right,
        _profile(spark, only_even=only_even).withColumn("op", F.lit("update")),
        "r0",
    )
    return left, right


def test_cobucketed_inner_equals_plain_join(spark):
    left, right = _pair(spark)
    got = sorted(
        (r.url, r.lsn, r.lang, r.lsn_r, r.score)
        for r in cobucketed_join(left, right).collect()
    )
    ldf, rdf = left.read(), right.read()
    rdf = rdf.withColumnRenamed("lsn", "lsn_r")
    want = sorted(
        (r.url, r.lsn, r.lang, r.lsn_r, r.score)
        for r in ldf.join(rdf, "url").collect()
    )
    assert got == want and len(got) == 150


def test_cobucketed_left_join_keeps_unmatched(spark):
    left, right = _pair(spark)
    rows = cobucketed_join(left, right, how="left").collect()
    assert len(rows) == 300
    unmatched = [r for r in rows if r.score is None]
    assert len(unmatched) == 150


def test_compacted_cobucketed_join_plan_has_no_shuffle(spark):
    left, right = _pair(spark)
    left.compact("c-l")
    right.compact("c-r")
    df = cobucketed_join(
        left, right, left_columns=["lang"], right_columns=["score"]
    )
    assert_no_shuffle(df)
    assert df.count() == 150
    # The plain-join control DOES shuffle when broadcast is off — the
    # table-wide exchange the co-bucketed plan avoids. (With broadcast
    # off the co-bucketed plan would shuffle too, but per bucket — Spark
    # cannot see co-partitioning in plain parquet scans; the scale claim
    # is exchange size bounded by a bucket, never the table.)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = left.read().join(
            right.read().withColumnRenamed("lsn", "lsn_r"), "url"
        )
        with pytest.raises(AssertionError):
            assert_no_shuffle(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_layout_mismatch_refuses(spark):
    left, _ = _pair(spark, n_buckets=4)
    other = _mk(
        spark,
        [("url", "string"), ("lsn", "bigint"), ("score", "bigint")],
        n_buckets=8,
    )
    with pytest.raises(ValueError, match="not co-bucketed"):
        cobucketed_join(left, other)


def test_split_depth_parity_enforced_and_join_survives_matching_splits(spark):
    left, right = _pair(spark)
    left.split_bucket(1, "sp-l")
    with pytest.raises(ValueError, match="not co-bucketed"):
        cobucketed_join(left, right)
    right.split_bucket(1, "sp-r")
    got = sorted(
        (r.url, r.score) for r in cobucketed_join(left, right).collect()
    )
    assert len(got) == 150
