"""SQL UPDATE / DELETE statements (sql_merge.dml_sql) compiled onto
maintenance.update_where / delete_where — parse, alias stripping,
fencing semantics, and guardrails."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.maintenance import update_where
from data_pipeline_spark.sql_merge import dml_sql


def _mk(spark, n_buckets=4):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_dml_"),
        [("url", "string"), ("lsn", "bigint"), ("v", "string"),
         ("score", "bigint")],
        "url", n_buckets,
    )


def _seed(spark):
    t = _mk(spark)
    merge_into(t, spark.createDataFrame(
        [("a", 1, "a1", 10, "insert"),
         ("b", 2, "b1", 20, "insert"),
         ("c", 3, "c1", 30, "insert")],
        "url string, lsn bigint, v string, score bigint, op string",
    ), "seed")
    return t


def _state(t):
    return {r.url: (r.lsn, r.v, r.score) for r in t.read().collect()}


def test_update_statement_applies_set_with_fence(spark):
    t = _seed(spark)
    st = dml_sql(
        "UPDATE pages AS p SET v = upper(p.v), score = p.score * 2 "
        "WHERE p.score >= 20",
        "u1", tables={"pages": t},
    )
    assert st.applied
    # fence = high-watermark (3) + 1; untouched rows keep their lsn
    assert _state(t) == {
        "a": (1, "a1", 10), "b": (4, "B1", 40), "c": (4, "C1", 60),
    }


def test_delete_statement_tombstones_matching_rows(spark):
    t = _seed(spark)
    dml_sql("DELETE FROM pages WHERE score > 10", "d1", tables={"pages": t})
    assert set(_state(t)) == {"a"}
    # fence: an event at/below the pre-delete watermark stays dead,
    # one above revives the key
    merge_into(t, spark.createDataFrame(
        [("b", 3, "late", 1, "update"), ("c", 9, "new", 2, "update")],
        "url string, lsn bigint, v string, score bigint, op string",
    ), "after")
    assert set(_state(t)) == {"a", "c"}


def test_update_then_delete_matches_direct_operators(spark):
    t1, t2 = _seed(spark), _seed(spark)
    dml_sql("UPDATE pages SET v = concat(v, '!') WHERE score < 25",
            "u", tables={"pages": t1})
    dml_sql("DELETE FROM pages WHERE v = 'c1'", "d", tables={"pages": t1})
    from data_pipeline_spark.maintenance import delete_where
    update_where(t2, {"v": "concat(v, '!')"}, "score < 25", "u")
    delete_where(t2, F.col("v") == "c1", "d")
    assert _state(t1) == _state(t2)


def test_where_is_optional_full_table(spark):
    t = _seed(spark)
    dml_sql("UPDATE pages SET score = 0", "u", tables={"pages": t})
    assert {s for (_, _, s) in _state(t).values()} == {0}
    dml_sql("DELETE FROM pages", "d", tables={"pages": t})
    assert _state(t) == {}


def test_idempotent_on_commit_key(spark):
    t = _seed(spark)
    dml_sql("UPDATE pages SET score = score + 1 WHERE true",
            "u1", tables={"pages": t})
    before = _state(t)
    st = dml_sql("UPDATE pages SET score = score + 1 WHERE true",
                 "u1", tables={"pages": t})
    assert not st.applied and _state(t) == before


def test_guardrails(spark):
    t = _seed(spark)
    with pytest.raises(KeyError):
        dml_sql("UPDATE pages SET url = 'x'", "g1", tables={"pages": t})
    with pytest.raises(KeyError):
        dml_sql("UPDATE pages SET lsn = 0", "g2", tables={"pages": t})
    with pytest.raises(KeyError):
        dml_sql("UPDATE pages SET nope = 1", "g3", tables={"pages": t})
    with pytest.raises(KeyError):
        dml_sql("DELETE FROM other WHERE true", "g4", tables={"pages": t})
    with pytest.raises(ValueError):
        dml_sql("UPDATE pages SET", "g5", tables={"pages": t})
    with pytest.raises(ValueError):
        dml_sql("TRUNCATE pages", "g6", tables={"pages": t})
    with pytest.raises(ValueError):
        # SET target qualified by a foreign alias
        dml_sql("UPDATE pages AS p SET q.v = 'x'", "g7", tables={"pages": t})


def test_alias_stripping_leaves_quoted_text_alone(spark):
    t = _seed(spark)
    dml_sql("UPDATE pages AS p SET v = concat('p.', p.v) WHERE p.url = 'a'",
            "u", tables={"pages": t})
    assert _state(t)["a"][1] == "p.a1"


def test_merge_dispatches_through_dml(spark):
    t = _seed(spark)
    src = spark.createDataFrame(
        [("a", 9, "a9", 1), ("z", 9, "z1", 2)],
        "url string, lsn bigint, v string, score bigint",
    )
    dml_sql(
        """
        MERGE INTO pages AS tgt USING updates AS u ON tgt.url = u.url
        WHEN MATCHED THEN UPDATE SET v = u.v
        WHEN NOT MATCHED THEN INSERT *
        """,
        "m", tables={"pages": t}, sources={"updates": src},
    )
    st = _state(t)
    assert st["a"][1] == "a9" and "z" in st


def test_insert_into_values_fence_and_upsert(spark):
    t = _seed(spark)
    dml_sql(
        "INSERT INTO pages (url, v, score) VALUES "
        "('d', 'd1', 40), ('a', 'a2', 11)",
        "i1", tables={"pages": t},
    )
    # omitted lsn -> fence hi+1 = 4; existing key 'a' is superseded (LWW),
    # never duplicated; omitted columns would land as NULL
    assert _state(t) == {
        "a": (4, "a2", 11), "b": (2, "b1", 20), "c": (3, "c1", 30),
        "d": (4, "d1", 40),
    }
    # explicit lsn below the live row loses the race (user owns ordering)
    dml_sql(
        "INSERT INTO pages (url, lsn, v, score) VALUES ('b', 1, 'old', 0)",
        "i2", tables={"pages": t},
    )
    assert _state(t)["b"] == (2, "b1", 20)


def test_insert_into_select_from_source_view(spark):
    t = _seed(spark)
    src = spark.createDataFrame(
        [("x", "vx", 7), ("y", "vy", 8)], "url string, v string, score bigint"
    )
    dml_sql(
        "INSERT INTO pages (url, v, score) "
        "SELECT url, v, score FROM staged WHERE score > 7",
        "i1", tables={"pages": t}, sources={"staged": src},
    )
    got = _state(t)
    assert got["y"] == (4, "vy", 8) and "x" not in got


def test_insert_overwrite_is_snapshot_sync(spark):
    t = _seed(spark)
    v0 = t.current().version
    dml_sql(
        "INSERT OVERWRITE pages (url, v, score) VALUES "
        "('a', 'A', 1), ('z', 'Z', 9)",
        "o1", tables={"pages": t},
    )
    assert _state(t) == {"a": (4, "A", 1), "z": (4, "Z", 9)}  # b, c swept
    # no physical truncate: time travel still reads the old state
    assert {r.url for r in t.read_version(v0).collect()} == {"a", "b", "c"}
    # idempotent replay on the commit key
    v = t.current().version
    dml_sql(
        "INSERT OVERWRITE pages (url, v, score) VALUES ('q', 'Q', 1)",
        "o1", tables={"pages": t},
    )
    assert t.current().version == v


def test_insert_guardrails(spark):
    t = _seed(spark)
    with pytest.raises(ValueError, match="must supply the key"):
        dml_sql("INSERT INTO pages (v, score) VALUES ('x', 1)",
                "g1", tables={"pages": t})
    with pytest.raises(KeyError, match="unknown columns"):
        dml_sql("INSERT INTO pages (url, nope) VALUES ('x', 1)",
                "g2", tables={"pages": t})
    with pytest.raises(ValueError, match="owns the order column"):
        dml_sql("INSERT OVERWRITE pages (url, lsn, v) VALUES ('x', 9, 'v')",
                "g3", tables={"pages": t})
    with pytest.raises(ValueError, match="yields 3 columns"):
        dml_sql("INSERT INTO pages (url, v) SELECT 'x', 'v', 1",
                "g4", tables={"pages": t})
    with pytest.raises(ValueError, match="duplicates"):
        dml_sql("INSERT INTO pages (url, url) VALUES ('x', 'x')",
                "g5", tables={"pages": t})
