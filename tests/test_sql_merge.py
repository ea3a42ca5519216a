"""SQL MERGE INTO front end (sql_merge.py): the Delta/Iceberg statement
text compiled onto merge_when — parse, alias rewrite, clause mapping,
and guardrails."""

import tempfile

import pytest

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.sql_merge import merge_sql


def _mk(spark, n_buckets=4):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_sqlm_"),
        [("url", "string"), ("lsn", "bigint"), ("v", "string"),
         ("score", "bigint")],
        "url", n_buckets,
    )


def _rows(spark, data):
    return spark.createDataFrame(
        data, "url string, lsn bigint, v string, score bigint, op string"
    )


def _seed(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("a", 1, "a1", 10, "insert"),
        ("b", 1, "b1", 20, "insert"),
        ("c", 1, "c1", 30, "insert"),
    ]), "seed")
    return t


def _src(spark):
    return spark.createDataFrame(
        [("a", 5, "a2", 100), ("b", 5, "b2", 999), ("d", 5, "d1", 40)],
        "url string, lsn bigint, v string, score bigint",
    )


def test_sql_statement_runs_the_classic_clauses(spark):
    t = _seed(spark)
    merge_sql(
        """
        MERGE INTO pages AS tgt
        USING updates AS u
        ON tgt.url = u.url
        WHEN MATCHED AND u.score >= 500 THEN DELETE
        WHEN MATCHED AND u.score < 500
          THEN UPDATE SET v = u.v, score = tgt.score + u.score
        WHEN NOT MATCHED THEN INSERT *
        """,
        "m1",
        tables={"pages": t},
        sources={"updates": _src(spark)},
    )
    got = {r["url"]: (r["lsn"], r["v"], r["score"])
           for r in t.read().collect()}
    assert got == {
        "a": (5, "a2", 110),
        "c": (1, "c1", 30),
        "d": (5, "d1", 40),
    }
    assert "b" not in got


def test_set_star_and_subquery_source(spark):
    t = _seed(spark)
    _src(spark).createOrReplaceTempView("upd_view")
    merge_sql(
        """
        MERGE INTO pages t
        USING (SELECT * FROM upd_view WHERE score < 500) s
        ON s.url = t.url
        WHEN MATCHED THEN UPDATE SET *
        """,
        "m1",
        tables={"pages": t},
    )
    got = {r["url"]: (r["lsn"], r["v"], r["score"])
           for r in t.read().collect()}
    # only 'a' qualified (subquery filter); whole row replaced
    assert got["a"] == (5, "a2", 100)
    assert got["b"] == (1, "b1", 20) and got["c"] == (1, "c1", 30)
    assert "d" not in got  # no INSERT clause


def test_idempotent_on_commit_key(spark):
    t = _seed(spark)
    stmt = """
        MERGE INTO pages t USING updates s ON t.url = s.url
        WHEN NOT MATCHED THEN INSERT *
    """
    merge_sql(stmt, "m1", tables={"pages": t},
              sources={"updates": _src(spark)})
    v = t.current().version
    again = merge_sql(stmt, "m1", tables={"pages": t},
                      sources={"updates": _src(spark)})
    assert again.applied is False and t.current().version == v


def test_guardrails(spark):
    t = _seed(spark)
    src = _src(spark)
    with pytest.raises(ValueError, match="key equality"):
        merge_sql(
            "MERGE INTO pages t USING updates s ON t.url = s.url "
            "AND t.lsn < s.lsn WHEN MATCHED THEN DELETE",
            "g1", tables={"pages": t}, sources={"updates": src},
        )
    with pytest.raises(ValueError, match="duplicate WHEN clause"):
        merge_sql(
            "MERGE INTO pages t USING updates s ON t.url = s.url "
            "WHEN MATCHED AND s.score > 1 THEN DELETE "
            "WHEN MATCHED THEN DELETE",
            "g2", tables={"pages": t}, sources={"updates": src},
        )
    with pytest.raises(ValueError, match="shadow"):
        merge_sql(
            "MERGE INTO pages t USING updates s ON t.url = s.url "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN MATCHED AND s.score > 500 THEN DELETE",
            "g3", tables={"pages": t}, sources={"updates": src},
        )
    with pytest.raises(KeyError, match="unknown target"):
        merge_sql(
            "MERGE INTO nope t USING updates s ON t.url = s.url "
            "WHEN MATCHED THEN DELETE",
            "g4", tables={"pages": t}, sources={"updates": src},
        )


def test_alias_rewrite_leaves_string_literals_alone(spark):
    t = _seed(spark)
    src = _src(spark)
    merge_sql(
        # 's.' inside the literal must NOT be rewritten; u.v reference must
        "MERGE INTO pages t USING updates u ON t.url = u.url "
        "WHEN MATCHED THEN UPDATE SET v = concat(u.v, ' u. literal')",
        "m1", tables={"pages": t}, sources={"updates": src},
    )
    got = {r["url"]: r["v"] for r in t.read().collect()}
    assert got["a"] == "a2 u. literal"


def test_by_source_sql_snapshot_sync(spark):
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 5, "a2", 11), ("d", 5, "d1", 44)],
        "url string, lsn bigint, v string, score bigint",
    )
    merge_sql(
        """
        MERGE INTO pages t USING snap s ON t.url = s.url
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.score >= 30 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = concat(t.v, '!stale')
        """,
        "sync",
        tables={"pages": t},
        sources={"snap": src},
    )
    got = {r["url"]: r["v"] for r in t.read().collect()}
    # a updated, d inserted, c (score 30) deleted, b marked stale
    assert got == {"a": "a2", "b": "b1!stale", "d": "d1"}


def test_by_source_sql_guardrails(spark):
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 5, "a2", 11)], "url string, lsn bigint, v string, score bigint"
    )

    def run(body, key="g"):
        merge_sql(
            f"MERGE INTO p t USING s s ON t.url = s.url\n{body}",
            key, tables={"p": t}, sources={"s": src},
        )

    with pytest.raises(ValueError, match="no source row to INSERT"):
        run("WHEN NOT MATCHED BY SOURCE THEN INSERT *")
    with pytest.raises(ValueError, match="SET \\* is meaningless"):
        run("WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *")
    with pytest.raises(ValueError, match="only t..* references"):
        run("WHEN NOT MATCHED BY SOURCE AND s.score > 1 THEN DELETE")
    with pytest.raises(ValueError, match="would shadow"):
        run(
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'x'\n"
            "WHEN NOT MATCHED BY SOURCE AND t.score > 1 THEN DELETE"
        )
    with pytest.raises(ValueError, match="duplicate WHEN clause"):
        run(
            "WHEN NOT MATCHED BY SOURCE THEN DELETE\n"
            "WHEN NOT MATCHED BY SOURCE AND t.score > 1 THEN DELETE"
        )
