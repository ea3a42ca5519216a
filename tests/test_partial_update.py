"""Partial-update merge mode: per-column latest-non-null collapse with
delete reset (operators/partial_update.py)."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.operators.partial_update import partial_update_collapse

DDL = "url string, lsn bigint, op string, a string, b string"


def _collapse(spark, rows):
    df = spark.createDataFrame(rows, DDL)
    out = partial_update_collapse(df, "url", "lsn", ["a", "b"])
    return {r["url"]: (r["lsn"], r["a"], r["b"]) for r in out.collect()}


def test_patches_accumulate_per_column(spark):
    got = _collapse(spark, [
        ("u", 1, "insert", "a1", "b1"),
        ("u", 2, "update", "a2", None),   # patches only a
        ("u", 3, "update", None, "b3"),   # patches only b
    ])
    # row is at lsn 3; a survives from lsn 2, b from lsn 3
    assert got == {"u": (3, "a2", "b3")}


def test_delete_resets_row(spark):
    got = _collapse(spark, [
        ("u", 1, "insert", "a1", "b1"),
        ("u", 2, "delete", None, None),
    ])
    assert got == {}  # dead key


def test_post_delete_patch_starts_fresh(spark):
    got = _collapse(spark, [
        ("u", 1, "insert", "a1", "b1"),
        ("u", 2, "delete", None, None),
        ("u", 3, "update", None, "b3"),   # only b patched after reset
    ])
    # a1 must NOT leak through the delete: a is NULL post-reset
    assert got == {"u": (3, None, "b3")}


def test_all_null_column_stays_null(spark):
    got = _collapse(spark, [
        ("u", 1, "update", None, "b1"),
        ("u", 2, "update", None, "b2"),
    ])
    assert got == {"u": (2, None, "b2")}


def test_late_patch_below_current_max_still_contributes(spark):
    # column b's newest non-null patch is OLDER than the row's max lsn
    got = _collapse(spark, [
        ("u", 5, "update", "a5", None),
        ("u", 3, "update", None, "b3"),
    ])
    assert got == {"u": (5, "a5", "b3")}


def test_determinism_under_shuffled_input(spark):
    rows = [
        ("u", 1, "insert", "a1", "b1"),
        ("u", 4, "update", None, "b4"),
        ("u", 2, "delete", None, None),
        ("u", 3, "update", "a3", None),
        ("v", 7, "update", "av", None),
    ]
    want = _collapse(spark, rows)
    got = _collapse(spark, list(reversed(rows)))
    assert want == got == {"u": (4, "a3", "b4"), "v": (7, "av", None)}


def test_lake_round_trip_raw_plus_collapse(spark):
    """Patch tables store EVERY patch row (commit_delta append; each
    (key, lsn) is a distinct physical row) and are read raw + collapsed
    through this operator — read()'s whole-row LWW collapse would fold a
    key's patches into only its newest and lose stitched columns."""
    root = tempfile.mkdtemp(prefix="lake_patch_")
    t = LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("op", "string"),
         ("a", "string"), ("b", "string")],
        "url", 4,
    )
    b1 = spark.createDataFrame(
        [("u", 1, "insert", "a1", "b1"), ("v", 1, "insert", "av", "bv")], DDL
    )
    b2 = spark.createDataFrame(
        [("u", 2, "update", None, "b2"), ("u", 3, "update", "a3", None)], DDL
    )
    t.commit_delta(b1, "p0")
    t.commit_delta(b2, "p1")
    raw = t.read(raw=True)
    out = partial_update_collapse(raw, "url", "lsn", ["a", "b"])
    got = {r["url"]: (r["lsn"], r["a"], r["b"]) for r in out.collect()}
    assert got == {"u": (3, "a3", "b2"), "v": (1, "av", "bv")}
    # whole-row LWW read would have dropped u's b2 patch — pin the
    # difference so nobody "simplifies" patch tables onto read()
    lww = {r["url"]: (r["a"], r["b"])
           for r in t.read().select("url", "a", "b").collect()}
    assert lww["u"] == ("a3", None)
