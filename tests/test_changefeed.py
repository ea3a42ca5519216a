"""Merge-mode changelog producer (operators/changefeed.py): retract
stream between two collapsed states, field-wise null-safe."""

import pytest

from data_pipeline_spark.operators.changefeed import collapsed_changelog

DDL = "url string, lsn bigint, a string"


def _diff(spark, before, after):
    b = spark.createDataFrame(before, DDL)
    a = spark.createDataFrame(after, DDL)
    out = collapsed_changelog(b, a, "url")
    return sorted(
        (r["url"], r["op"], r["lsn"], r["a"]) for r in out.collect()
    )


def test_insert_delete_update_classified(spark):
    got = _diff(
        spark,
        [("u", 1, "x"), ("v", 1, "y")],
        [("u", 2, "z"), ("w", 1, "n")],
    )
    assert got == [
        ("u", "update_postimage", 2, "z"),
        ("u", "update_preimage", 1, "x"),
        ("v", "delete", 1, "y"),
        ("w", "insert", 1, "n"),
    ]


def test_unchanged_keys_emit_nothing_even_with_null_fields(spark):
    # NULL columns are legitimate patch-table state: both-NULL == equal
    rows = [("u", 1, None), ("v", 2, "y")]
    assert _diff(spark, rows, rows) == []


def test_null_to_value_is_an_update(spark):
    got = _diff(spark, [("u", 1, None)], [("u", 1, "x")])
    assert got == [
        ("u", "update_postimage", 1, "x"),
        ("u", "update_preimage", 1, None),
    ]


def test_schema_mismatch_refused(spark):
    b = spark.createDataFrame([("u", 1, "x")], DDL)
    a = b.withColumnRenamed("a", "b")
    with pytest.raises(ValueError, match="one schema"):
        collapsed_changelog(b, a, "url")
