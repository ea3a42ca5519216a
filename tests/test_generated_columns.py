"""Generated columns (constraints.py GEN_PREFIX): write-funnel
computation, supplied-value validation, delete exemption, declaration
guards, drop semantics."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark import constraints as C
from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable


def _mk(spark):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_gen_"),
        [("url", "string"), ("lsn", "bigint"), ("path", "string"),
         ("domain", "string")],
        "url", 4,
    )


DOMAIN = "split_part(url, '/', 3)"


def _rows(spark, data, cols="url string, lsn bigint, path string, op string"):
    return spark.createDataFrame(data, cols)


def test_omitted_column_is_computed(spark):
    t = _mk(spark)
    C.add_generated(t, "domain", DOMAIN)
    merge_into(t, _rows(spark, [
        ("https://a.com/x", 1, "/x", "upsert"),
        ("https://b.com/y", 2, "/y", "upsert"),
    ]), "c1")
    got = {r.url: r.domain for r in t.read().collect()}
    assert got == {"https://a.com/x": "a.com", "https://b.com/y": "b.com"}


def test_supplied_values_validated(spark):
    t = _mk(spark)
    C.add_generated(t, "domain", DOMAIN)
    ok = spark.createDataFrame(
        [("https://a.com/x", 1, "/x", "a.com", "upsert")],
        "url string, lsn bigint, path string, domain string, op string",
    )
    merge_into(t, ok, "c1")  # matching values pass
    bad = spark.createDataFrame(
        [("https://b.com/y", 2, "/y", "WRONG", "upsert")],
        "url string, lsn bigint, path string, domain string, op string",
    )
    v0 = t.current().version
    with pytest.raises(C.CheckViolation, match="disagree"):
        merge_into(t, bad, "c2")
    assert t.current().version == v0  # refused before any commit


def test_deletes_exempt(spark):
    t = _mk(spark)
    C.add_generated(t, "domain", DOMAIN)
    merge_into(t, _rows(spark, [("https://a.com/x", 1, "/x", "upsert")]), "c1")
    merge_into(t, _rows(spark, [("https://a.com/x", 2, None, "delete")]), "c2")
    assert t.read().count() == 0


def test_declaration_guards_and_existing_rows(spark):
    t = _mk(spark)
    with pytest.raises(ValueError, match="key/order"):
        C.add_generated(t, "lsn", "1")
    with pytest.raises(KeyError):
        C.add_generated(t, "nope", "1")
    with pytest.raises(ValueError, match="resolve"):
        C.add_generated(t, "domain", "no_such_col || 'x'")
    # existing rows disagreeing with the derivation refuse the declaration
    merge_into(t, spark.createDataFrame(
        [("https://a.com/x", 1, "/x", "stale", "upsert")],
        "url string, lsn bigint, path string, domain string, op string",
    ), "c1")
    with pytest.raises(C.CheckViolation, match="backfill"):
        C.add_generated(t, "domain", DOMAIN)


def test_drop_stops_computation(spark):
    t = _mk(spark)
    C.add_generated(t, "domain", DOMAIN)
    C.drop_generated(t, "domain")
    merge_into(t, _rows(spark, [("https://a.com/x", 1, "/x", "upsert")]), "c1")
    assert t.read().first()["domain"] is None
    with pytest.raises(ValueError, match="not generated"):
        C.drop_generated(t, "domain")
