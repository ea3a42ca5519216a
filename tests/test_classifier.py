"""Closed-form least-squares quality classifier
(operators/classifier.py): cross-engine parity, near-perfect recovery of
a linearly-representable label rule, and exactness of the 128-bit
Cramer solve."""

import duckdb

from data_pipeline_spark.operators.classifier import (
    DUCK,
    SPARK,
    ls_classifier_sql,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _duck_on(path):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{path}/documents.parquet')"
    )
    return con.execute(ls_classifier_sql(DUCK)).fetchall()


def test_spark_duck_parity_on_corpus(spark):
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
        .createOrReplaceTempView("documents")
    sp = {tuple(r) for r in spark.sql(ls_classifier_sql(SPARK)).collect()}
    dk = {tuple(r) for r in _duck_on(SF_SMOKE)}
    assert sp == dk and len(sp) >= 2


def test_recovers_linear_label_rule(spark):
    """The label rule (10*uniq >= 4*total) is linear in the features, so
    the trained plane must recover it almost exactly — a broken solve
    (wrong determinant, sign slip, precision loss) craters accuracy."""
    rows = _duck_on(SF_SMOKE)
    total = sum(r[2] for r in rows)
    correct = sum(r[2] for r in rows if r[0] == r[1])
    assert correct / total >= 0.95
    # both label classes present (non-vacuous)
    assert {r[0] for r in rows} == {-1, 1}


def test_exact_solve_on_synthetic_separable(spark):
    """Hand-built corpus: repetitive docs (one word repeated) vs diverse
    docs (all-unique words). Perfect separation expected."""
    rows = []
    for i in range(20):
        rows.append((i, " ".join(["dup"] * 30)))                 # y = -1
        rows.append((100 + i, " ".join(f"u{i}w{j}" for j in range(30))))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = con.execute(ls_classifier_sql(DUCK)).fetchall()
    assert all(label == predicted for label, predicted, *_ in got)
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .createOrReplaceTempView("documents")
    sp = {tuple(r) for r in spark.sql(ls_classifier_sql(SPARK)).collect()}
    assert sp == {tuple(r) for r in got}
