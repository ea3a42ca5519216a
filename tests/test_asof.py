"""As-of join operator: backward <= matching, ties, unmatched NULLs,
tolerance, and probe-column preservation."""

from pyspark.sql import functions as F

from data_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return F.to_timestamp(F.lit(s))


def _build(spark):
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", 1, "v1"),
            ("a", "2024-01-03 00:00:00", 3, "v3"),
            ("b", "2024-01-05 00:00:00", 5, "w5"),
        ],
        "url string, warc_ts string, lsn bigint, v string",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _probe(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, probe_id bigint"
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def test_asof_backward_and_ties(spark):
    probe = _probe(spark, [
        ("a", "2024-01-02 00:00:00", 10),  # between v1 and v3 -> v1
        ("a", "2024-01-03 00:00:00", 11),  # tie -> v3 (<= semantics)
        ("a", "2024-01-09 00:00:00", 12),  # after all -> v3
        ("b", "2024-01-01 00:00:00", 13),  # before any build -> NULL
        ("c", "2024-01-05 00:00:00", 14),  # key never built -> NULL
    ])
    got = {
        r.probe_id: (r.v_matched, r.lsn_matched)
        for r in asof_join(probe, _build(spark)).collect()
    }
    assert got == {
        10: ("v1", 1),
        11: ("v3", 3),
        12: ("v3", 3),
        13: (None, None),
        14: (None, None),
    }


def test_asof_tolerance(spark):
    probe = _probe(spark, [
        ("a", "2024-01-03 00:30:00", 20),  # 30 min after v3 -> within 1h
        ("a", "2024-01-04 12:00:00", 21),  # 36 h after v3 -> stale
    ])
    got = {
        r.probe_id: r.v_matched
        for r in asof_join(
            probe, _build(spark), tolerance_s=3600
        ).collect()
    }
    assert got == {20: "v3", 21: None}


def test_asof_preserves_probe_columns_and_rowcount(spark):
    probe = _probe(spark, [
        ("a", "2024-01-02 00:00:00", 30),
        ("zzz", "2024-01-02 00:00:00", 31),
    ])
    out = asof_join(probe, _build(spark))
    rows = out.collect()
    assert len(rows) == 2  # left join: every probe row survives
    assert {c for c in out.columns} == {
        "url", "warc_ts", "probe_id",
        "warc_ts_matched", "lsn_matched", "v_matched",
    }
    assert {r.probe_id for r in rows} == {30, 31}


def test_asof_single_shuffle_plan(spark):
    """Plan pin: exactly one exchange (on the key) — no probe x versions
    join blow-up."""
    probe = _probe(spark, [("a", "2024-01-02 00:00:00", 40)])
    plan = asof_join(probe, _build(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
