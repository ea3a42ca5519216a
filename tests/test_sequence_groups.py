"""Sequence-group partial update: per-group sequence columns own their
column groups (operators/partial_update.py sequence_group_collapse —
the Paimon fields.<seq>.sequence-group merge engine)."""

from data_pipeline_spark.operators.partial_update import (
    sequence_group_collapse,
)

# Two groups: sa owns (a1, a2), sb owns (b,).
DDL = (
    "url string, lsn bigint, op string, "
    "sa bigint, a1 string, a2 string, sb bigint, b string"
)
GROUPS = {"sa": ["a1", "a2"], "sb": ["b"]}


def _collapse(spark, rows):
    df = spark.createDataFrame(rows, DDL)
    out = sequence_group_collapse(df, "url", "lsn", GROUPS)
    return {
        r["url"]: (r["lsn"], r["sa"], r["a1"], r["a2"], r["sb"], r["b"])
        for r in out.collect()
    }


def test_groups_win_independently_of_default_order(spark):
    # Feed B's events arrive LATER on the default order but with LOWER
    # group sequence — the newer default-order event must not regress b.
    got = _collapse(spark, [
        ("u", 1, "insert", 10, "x1", "y1", 20, "b-new"),
        ("u", 2, "update", 11, "x2", "y2", 5, "b-old"),
    ])
    # a-group: sa=11 wins; b-group: sb=20 wins despite lower lsn.
    assert got == {"u": (2, 11, "x2", "y2", 20, "b-new")}


def test_group_updates_atomically(spark):
    # The a-group's two columns must come from the SAME winning event —
    # no cross-event stitching inside a group.
    got = _collapse(spark, [
        ("u", 1, "insert", 10, "x1", None, 1, "b"),
        ("u", 2, "update", 11, None, "y2", None, None),
    ])
    # sa=11 wins the whole group: a1 is NULL from that event (not "x1").
    assert got == {"u": (2, 11, None, "y2", 1, "b")}


def test_null_sequence_rows_do_not_compete(spark):
    got = _collapse(spark, [
        ("u", 1, "insert", 10, "x1", "y1", None, None),
        ("u", 2, "update", None, "ghost", "ghost", 7, "b7"),
    ])
    # lsn 2 has no sa: the a-group stays at sa=10 even though the event
    # is newer on the default order and carries non-null a-columns.
    assert got == {"u": (2, 10, "x1", "y1", 7, "b7")}


def test_delete_resets_every_group(spark):
    got = _collapse(spark, [
        ("u", 1, "insert", 10, "x1", "y1", 99, "b-high"),
        ("u", 2, "delete", None, None, None, None, None),
        ("u", 3, "insert", 1, "x3", "y3", 2, "b-low"),
    ])
    # Pre-delete seqs were HIGHER, but the fence rides the default
    # order: post-delete low-seq values must win (the two-dimensional
    # case a single-aggregate collapse would get wrong).
    assert got == {"u": (3, 1, "x3", "y3", 2, "b-low")}


def test_dead_key_vanishes_and_group_with_no_winner_is_null(spark):
    got = _collapse(spark, [
        ("d", 1, "insert", 1, "x", "y", 1, "b"),
        ("d", 2, "delete", None, None, None, None, None),
        ("u", 3, "insert", 5, "x5", "y5", None, None),
    ])
    assert got == {"u": (3, 5, "x5", "y5", None, None)}


def test_deterministic_under_shuffled_input(spark):
    rows = [
        ("u", i, "update" if i > 1 else "insert",
         (i * 37) % 11, f"a{i}", f"y{i}",
         (i * 53) % 13 if i % 2 == 0 else None,
         f"b{i}" if i % 2 == 0 else None)
        for i in range(1, 20)
    ]
    fwd = _collapse(spark, rows)
    rev = _collapse(spark, list(reversed(rows)))
    assert fwd == rev
