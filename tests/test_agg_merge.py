"""Aggregation merge mode: per-key fold of change events with delete
reset (operators/agg_merge.py)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.operators.agg_merge import aggregate_collapse

DDL = "url string, lsn bigint, op string, v int, tag string"
SPEC = {"v": "sum", "tag": "last"}


def _fold(spark, rows, spec=None):
    df = spark.createDataFrame(rows, DDL)
    out = aggregate_collapse(df, "url", "lsn", spec or SPEC)
    cols = ["lsn"] + list((spec or SPEC).keys())
    return {r["url"]: tuple(r[c] for c in cols) for r in out.collect()}


def test_sum_and_last_fold(spark):
    got = _fold(spark, [
        ("u", 1, "insert", 10, "x"),
        ("u", 2, "update", 5, None),
        ("u", 3, "update", 7, "y"),
    ])
    assert got == {"u": (3, 22, "y")}


def test_delete_resets_accumulator(spark):
    got = _fold(spark, [
        ("u", 1, "insert", 10, "x"),
        ("u", 2, "delete", None, None),
        ("u", 3, "update", 5, None),
    ])
    # only the post-delete contribution counts; tag reset to NULL
    assert got == {"u": (3, 5, None)}


def test_dead_key_disappears(spark):
    got = _fold(spark, [
        ("u", 1, "insert", 10, "x"),
        ("u", 2, "delete", None, None),
    ])
    assert got == {}


def test_min_max_count(spark):
    got = _fold(spark, [
        ("u", 1, "insert", 10, "a"),
        ("u", 2, "update", 3, "b"),
        ("u", 3, "update", 8, None),
    ], spec={"v": "min", "tag": "count"})
    assert got == {"u": (3, 3, 2)}  # min v = 3; count skips the NULL tag
    assert _fold(spark, [
        ("u", 1, "insert", 10, "a"),
        ("u", 2, "update", 3, None),
    ], spec={"v": "max", "tag": "count"}) == {"u": (2, 10, 1)}


def test_unknown_fold_raises(spark):
    df = spark.createDataFrame([("u", 1, "insert", 1, "x")], DDL)
    with pytest.raises(ValueError, match="unknown fold"):
        aggregate_collapse(df, "url", "lsn", {"v": "median"})


def test_determinism_under_shuffled_input(spark):
    rows = [
        ("u", 4, "update", 2, "d"),
        ("u", 1, "insert", 10, "a"),
        ("u", 3, "update", 1, None),
        ("u", 2, "delete", None, None),
        ("v", 9, "update", 5, "z"),
    ]
    want = _fold(spark, rows)
    got = _fold(spark, list(reversed(rows)))
    assert want == got == {"u": (4, 3, "d"), "v": (9, 5, "z")}
