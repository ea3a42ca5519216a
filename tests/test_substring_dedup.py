"""Exact-substring dedup (shingle-island form of the suffix-array dedup):
planted duplicated runs must come out as exactly the planted spans, with
byte-identical span text on both engine and oracle sides."""

import duckdb

from data_pipeline_spark import queries as q


def _run_spark(spark, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string").createOrReplaceTempView(
        "documents"
    )
    # Drive the registered Spark SQL text over the planted temp view.
    return {
        (r.doc_id, r.span_start, r.span_len, r.span_md5)
        for r in spark.sql(q.SUBSTR_DEDUP_SPARK_SQL).collect()
    }


def _mk_corpus():
    # 25-token run shared by docs 1 and 2, at different offsets; doc 3 is
    # all-unique filler; doc 4 shares only a 9-token run with doc 1
    # (below K=10 -> must NOT fire).
    shared = " ".join(f"dup{i}" for i in range(25))
    sub_k = " ".join(f"dup{i}" for i in range(9))
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    return [
        (1, uniq("a", 7) + " " + shared + " " + uniq("b", 5)),
        (2, uniq("c", 3) + " " + shared + " " + uniq("d", 9)),
        (3, uniq("e", 40)),
        (4, uniq("f", 12) + " " + sub_k + " " + uniq("g", 12)),
    ]


def test_planted_run_yields_exact_spans(spark):
    got = _run_spark(spark, _mk_corpus())
    by_doc = {d: (s, n, h) for d, s, n, h in got}
    assert set(by_doc) == {1, 2}, got
    # span = exactly the planted 25-token run at its per-doc offset
    assert by_doc[1][:2] == (7, 25)
    assert by_doc[2][:2] == (3, 25)
    # byte-identical duplicated text -> identical md5 across docs
    assert by_doc[1][2] == by_doc[2][2]


def test_sub_k_overlap_does_not_fire(spark):
    got = _run_spark(spark, _mk_corpus())
    assert all(d != 4 for d, *_ in got)


def test_duckdb_oracle_matches_on_planted_corpus(spark):
    got = _run_spark(spark, _mk_corpus())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", _mk_corpus()
    )
    duck = set(
        tuple(r) for r in con.execute(
            q.REGISTRY["docs_substring_dedup"].oracle
        ).fetchall()
    )
    assert duck == got
