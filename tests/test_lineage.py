"""Row lineage: span identity survives updates, resets at delete-rebirth,
dead keys drop out, and the plan carries exactly one exchange."""

from pyspark.sql import functions as F

from data_pipeline_spark.operators.lineage import row_lineage


def _feed(spark, rows):
    # rows: (url, lsn, op)
    df = spark.createDataFrame(rows, "url string, lsn bigint, op string")
    return df.select(
        "url", "lsn",
        F.to_timestamp(
            F.format_string("2024-01-01 00:00:%02d", (F.col("lsn") % 60))
        ).alias("warc_ts"),
        "op",
    )


def test_spans_and_rebirths(spark):
    feed = _feed(spark, [
        ("a", 1, "insert"), ("a", 2, "update"), ("a", 3, "update"),
        ("b", 4, "insert"), ("b", 5, "delete"), ("b", 6, "insert"),
        ("b", 7, "update"),
        ("c", 8, "insert"), ("c", 9, "delete"),          # dead
        ("d", 10, "delete"), ("d", 11, "update"),        # revive-by-update
    ])
    got = {
        r.url: (r.row_id, r.last_lsn, r.n_versions, r.n_prior_deletes)
        for r in row_lineage(feed).collect()
    }
    assert got == {
        "a": (1, 3, 3, 0),   # identity stable across updates
        "b": (6, 7, 2, 1),   # rebirth: row_id moved to the re-insert
        "d": (11, 11, 1, 1), # update after delete opens a new span
    }
    assert "c" not in got


def test_single_exchange_plan(spark):
    feed = _feed(spark, [("a", 1, "insert"), ("a", 2, "update")])
    plan = row_lineage(feed)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
