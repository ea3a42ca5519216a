"""Mode-aware compaction for APPEND merge-mode tables
(maintenance.compact_append): files-only rewrite preserves the event
multiset; fold compaction below a horizon refolds to exactly the
unfolded answer — including count accumulators and deletes that arrive
after the fold."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.maintenance import compact_append
from data_pipeline_spark.operators import agg_merge, partial_update

PATCH_DDL = "url string, lsn bigint, op string, a string, b string"
AGG_DDL = "url string, lsn bigint, op string, n bigint, c bigint, l string"

PATCH_FIELDS = [
    ("url", "string"), ("lsn", "bigint"), ("op", "string"),
    ("a", "string"), ("b", "string"),
]
AGG_FIELDS = [
    ("url", "string"), ("lsn", "bigint"), ("op", "string"),
    ("n", "bigint"), ("c", "bigint"), ("l", "string"),
]

PATCH_EVENTS = [
    # u: patches straddle the horizon
    ("u", 1, "insert", "a1", "b1"),
    ("u", 2, "update", "a2", None),
    ("u", 3, "update", None, "b3"),
    # v: dead below the horizon
    ("v", 1, "insert", "av", "bv"),
    ("v", 2, "delete", None, None),
    # w: folded base killed by a YOUNG delete
    ("w", 1, "insert", "aw", "bw"),
    ("w", 3, "delete", None, None),
    # x: young-only key
    ("x", 3, "update", None, "bx"),
    # y: delete below horizon, fresh patch above — a1 must not leak
    ("y", 1, "update", None, "by"),
    ("y", 2, "delete", None, None),
    ("y", 3, "update", "ay", None),
]
HORIZON = 2


def _patch_rows(df):
    out = partial_update.partial_update_collapse(df, "url", "lsn", ["a", "b"])
    return {r["url"]: (r["lsn"], r["a"], r["b"]) for r in out.collect()}


def _mk_patch_table(spark):
    root = tempfile.mkdtemp(prefix="lake_foldc_")
    t = LakeTable.create(spark, root, PATCH_FIELDS, "url", 4)
    ev = spark.createDataFrame(PATCH_EVENTS, PATCH_DDL)
    t.commit_delta(ev.filter(F.col("lsn") <= HORIZON), "p0")
    t.commit_delta(ev.filter(F.col("lsn") > HORIZON), "p1")
    return t, ev


def test_fold_compaction_patch_equivalence(spark):
    t, ev = _mk_patch_table(spark)
    want = _patch_rows(ev)
    assert want == {
        "u": (3, "a2", "b3"), "x": (3, None, "bx"), "y": (3, "ay", None),
    }
    n_raw_before = t.read(raw=True).count()
    snap = compact_append(
        t, "fold0",
        fold=lambda df: partial_update.fold_events(
            df, "url", "lsn", ["a", "b"]
        ),
        horizon=HORIZON,
        min_files=1,
    )
    assert snap is not None
    assert _patch_rows(t.read(raw=True)) == want
    # events below the horizon folded away: strictly fewer physical rows
    assert t.read(raw=True).count() < n_raw_before
    # every compacted bucket is down to one base file
    for b in snap.manifests:
        entries = t.bucket_entries(snap, b)
        assert len(entries) <= 1
        assert all(e.get("kind", "base") == "base" for e in entries)
    # idempotent replay: same key commits nothing new
    assert compact_append(t, "fold0", min_files=1).version == snap.version


def test_fold_compaction_agg_count_refolds(spark):
    """The count accumulator is the sharp edge: a folded base row must
    contribute its stored count (not 1) on refold, and a delete arriving
    AFTER the fold must reset the accumulator row."""
    root = tempfile.mkdtemp(prefix="lake_foldagg_")
    t = LakeTable.create(spark, root, AGG_FIELDS, "url", 4)
    spec = {"n": "sum", "c": "count", "l": "last"}
    early = [
        ("u", 1, "insert", 10, 1, "en"),
        ("u", 2, "update", 5, 1, None),
        ("v", 1, "insert", 7, 1, "fr"),
        ("w", 1, "insert", 1, 1, "de"),
    ]
    late = [
        ("u", 3, "update", 2, 1, "es"),   # folds onto u's accumulator
        ("w", 3, "delete", None, None, None),  # resets w's accumulator
        ("w", 4, "update", 9, 1, None),   # fresh row post-reset
        ("z", 3, "insert", 4, 1, "it"),
    ]
    t.commit_delta(spark.createDataFrame(early, AGG_DDL), "a0")
    compact_append(
        t, "folda",
        fold=lambda df: agg_merge.fold_events(df, "url", "lsn", spec),
        horizon=2,
        min_files=1,
    )
    t.commit_delta(spark.createDataFrame(late, AGG_DDL), "a1")
    got = {
        r["url"]: (r["lsn"], r["n"], r["c"], r["l"])
        for r in agg_merge.aggregate_collapse(
            t.read(raw=True), "url", "lsn", spec
        ).collect()
    }
    direct = spark.createDataFrame(early + late, AGG_DDL)
    want = {
        r["url"]: (r["lsn"], r["n"], r["c"], r["l"])
        for r in agg_merge.aggregate_collapse(
            direct, "url", "lsn", spec
        ).collect()
    }
    assert got == want
    assert got["u"] == (3, 17, 3, "es")   # count 3 == 2 folded + 1 fresh
    assert got["w"] == (4, 9, 1, None)    # accumulator reset by the delete
    assert got["v"] == (1, 7, 1, "fr")    # untouched accumulator row


def test_files_only_compaction_preserves_event_multiset(spark):
    t, ev = _mk_patch_table(spark)
    before = sorted(
        tuple(r) for r in t.read(raw=True).drop("__deleted").collect()
    )
    snap = compact_append(t, "files0", min_files=2)
    assert snap is not None
    after = sorted(
        tuple(r) for r in t.read(raw=True).drop("__deleted").collect()
    )
    assert before == after
    for b in snap.summary["touched"]:
        assert len(t.bucket_entries(snap, b)) == 1


def test_fold_requires_horizon(spark):
    t, _ = _mk_patch_table(spark)
    with pytest.raises(ValueError, match="horizon"):
        compact_append(t, "bad", fold=lambda df: df)
