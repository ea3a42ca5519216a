"""HyperLogLog register sketches (operators/sketches.py): merge algebra,
estimator accuracy, determinism, and DuckDB arithmetic parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.operators.sketches import (
    M_REGISTERS,
    hll_estimate,
    hll_estimate_exact_py,
    hll_merge,
    hll_sketch,
    hll_sketch_duckdb_sql,
)

SF_DIR = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _regs(df):
    return {
        tuple(r[c] for c in df.columns if c not in ("reg", "maxrank"))
        + (r["reg"],): r["maxrank"]
        for r in df.collect()
    }


def test_merge_equals_one_shot(spark):
    d = _docs(spark).select("doc_id", "lang")
    whole = hll_sketch(d, ["lang"], "doc_id")
    parts = [
        hll_sketch(
            d.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i),
            ["lang"], "doc_id",
        )
        for i in range(3)
    ]
    assert _regs(hll_merge(*parts)) == _regs(whole)


def test_merge_idempotent_on_overlap(spark):
    d = _docs(spark).select("doc_id", "lang")
    whole = hll_sketch(d, ["lang"], "doc_id")
    # overlapping shards (second includes half the first) still converge
    a = hll_sketch(
        d.filter(F.pmod(F.xxhash64("doc_id"), F.lit(4)) <= 1), ["lang"], "doc_id"
    )
    b = hll_sketch(
        d.filter(F.pmod(F.xxhash64("doc_id"), F.lit(4)) >= 1), ["lang"], "doc_id"
    )
    assert _regs(hll_merge(a, b, whole)) == _regs(whole)


def test_estimate_accuracy_global(spark):
    d = _docs(spark).select("doc_id").withColumn("g", F.lit(1))
    exact = d.select("doc_id").distinct().count()
    sk = hll_sketch(d, ["g"], "doc_id")
    est = hll_estimate(sk, ["g"]).first()["est"]
    # m=256 → stddev ≈ 1.04/16 ≈ 6.5%; 3σ bound
    assert abs(est - exact) / exact < 0.20, (est, exact)
    # spark estimator agrees with the exact-integer python reference
    regs = {r["reg"]: r["maxrank"] for r in sk.collect()}
    assert est == pytest.approx(hll_estimate_exact_py(regs), rel=1e-6)


def test_determinism_across_partitioning(spark):
    d = _docs(spark).select("doc_id", "lang")
    a = _regs(hll_sketch(d.repartition(2), ["lang"], "doc_id"))
    b = _regs(hll_sketch(d.repartition(17, "lang"), ["lang"], "doc_id"))
    assert a == b


def test_duckdb_register_parity(spark):
    d = _docs(spark).select("doc_id", "lang")
    sp = {
        (r["lang"], r["reg"]): r["maxrank"]
        for r in hll_sketch(d, ["lang"], "doc_id").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW __d AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    q = hll_sketch_duckdb_sql(
        "SELECT lang, doc_id FROM __d", ["lang"], "doc_id"
    )
    dk = {(r[0], r[1]): r[2] for r in con.execute(q).fetchall()}
    assert sp == dk


def test_register_bounds(spark):
    d = _docs(spark).select("doc_id", "lang")
    sk = hll_sketch(d, ["lang"], "doc_id")
    bad = sk.filter(
        (F.col("reg") < 0) | (F.col("reg") >= M_REGISTERS)
        | (F.col("maxrank") < 1) | (F.col("maxrank") > 49)
    )
    assert bad.count() == 0
    per_group = sk.groupBy("lang").count().agg(F.max("count")).first()[0]
    assert per_group <= M_REGISTERS
