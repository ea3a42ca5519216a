"""First-row merge mode (operators/first_row.py): earliest insert wins,
non-inserts ignored, deterministic under shuffled input and order ties."""

from data_pipeline_spark.operators.first_row import first_row_collapse

DDL = "url string, lsn bigint, op string, v string"


def _collapse(spark, rows):
    df = spark.createDataFrame(rows, DDL)
    out = first_row_collapse(df, "url", "lsn")
    return {r["url"]: (r["lsn"], r["v"]) for r in out.collect()}


def test_first_insert_wins_updates_ignored(spark):
    got = _collapse(spark, [
        ("u", 1, "insert", "v1"),
        ("u", 2, "update", "v2"),
        ("u", 3, "insert", "v3"),   # redelivered/late re-insert loses
        ("w", 5, "update", "w5"),   # no insert ever -> no row
    ])
    assert got == {"u": (1, "v1")}


def test_deletes_do_not_participate(spark):
    got = _collapse(spark, [
        ("u", 2, "delete", None),
        ("u", 3, "insert", "v3"),
    ])
    assert got == {"u": (3, "v3")}


def test_determinism_under_shuffle_and_tie(spark):
    rows = [
        ("u", 1, "insert", "a"),
        ("u", 1, "insert", "b"),   # order tie -> min fingerprint wins
        ("v", 2, "insert", "x"),
    ]
    want = _collapse(spark, rows)
    got = _collapse(spark, list(reversed(rows)))
    assert want == got
    assert want["v"] == (2, "x") and want["u"][0] == 1
