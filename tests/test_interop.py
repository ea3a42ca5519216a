"""External-reader interop: DuckDB (standing in for any parquet-capable
engine) reads a pinned snapshot via reader_sql / scan_spec and matches
``LakeTable.read()`` exactly — across delta tails, compaction, schema
evolution, deletes, and include_tombstones."""

import os
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.interop import (
    duckdb_view_sql,
    reader_sql,
    scan_spec,
    write_symlink_manifest,
)
from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable


def _mk(spark, n_buckets=4):
    root = tempfile.mkdtemp(prefix="lake_interop_")
    return LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("v", "string")],
        "url", n_buckets,
    )


def _rows(spark, data):
    return spark.createDataFrame(data, "url string, lsn bigint, v string, op string")


def _multiset(rows):
    return sorted(tuple("∅" if v is None else str(v) for v in r) for r in rows)


def _spark_multiset(df):
    cols = sorted(df.columns)
    return cols, _multiset([tuple(r[c] for c in cols) for r in df.collect()])


def _duck_multiset(sql, spark_cols):
    cur = duckdb.connect().execute(sql)
    names = [d[0] for d in cur.description]
    assert sorted(names) == spark_cols
    idx = [names.index(c) for c in spark_cols]
    return _multiset([tuple(r[i] for i in idx) for r in cur.fetchall()])


def _assert_match(table, snap=None, include_tombstones=False):
    df = table.read(snap=snap, include_tombstones=include_tombstones)
    cols, want = _spark_multiset(df)
    got = _duck_multiset(
        reader_sql(table, snap=snap, include_tombstones=include_tombstones),
        cols,
    )
    assert got == want


def test_reader_sql_with_delta_tail(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("a", 1, "a1", "insert"), ("b", 1, "b1", "insert"),
        ("c", 1, "c1", "insert"),
    ]), "c0")
    t.compact("compact0")
    # delta tail: update one key, delete another, insert a new one
    merge_into(t, _rows(spark, [
        ("a", 2, "a2", "update"), ("b", 2, None, "delete"),
        ("d", 2, "d1", "insert"),
    ]), "c1")
    _assert_match(t)
    _assert_match(t, include_tombstones=True)


def test_reader_sql_fully_compacted(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("a", 1, "a1", "insert"), ("b", 1, "b1", "insert"),
    ]), "c0")
    merge_into(t, _rows(spark, [("a", 2, "a2", "update")]), "c1")
    t.compact("compact0")
    _assert_match(t)


def test_reader_sql_across_schema_evolution(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("a", 1, "a1", "insert"), ("b", 1, "b1", "insert"),
    ]), "c0")
    t.evolve_schema(add_columns={"lang": "string"}, commit_key="evo0")
    src = spark.createDataFrame(
        [("c", 2, "c1", "fr", "insert")],
        "url string, lsn bigint, v string, lang string, op string",
    )
    merge_into(t, src, "c1")
    # old files lack lang (aligned to NULL), new files carry it
    _assert_match(t)


def test_reader_sql_pinned_old_snapshot(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("a", 1, "a1", "insert")]), "c0")
    pinned = t.current()
    merge_into(t, _rows(spark, [("a", 2, "a2", "update")]), "c1")
    # the pinned export must see lsn=1 even though head moved
    _assert_match(t, snap=pinned)
    cols, want = _spark_multiset(t.read(snap=pinned))
    assert cols == ["lsn", "url", "v"]
    assert ("1", "a", "a1") in [tuple(w) for w in want]


def test_reader_sql_empty_table(spark):
    t = _mk(spark)
    cols, want = _spark_multiset(t.read())
    assert want == []
    got = _duck_multiset(reader_sql(t), cols)
    assert got == []


def test_duckdb_view_and_symlink_manifest(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("a", 1, "a1", "insert"), ("b", 1, "b1", "insert"),
    ]), "c0")
    con = duckdb.connect()
    con.execute(duckdb_view_sql(t, "pages"))
    assert con.execute("SELECT count(*) FROM pages").fetchone()[0] == 2

    mf = write_symlink_manifest(t)
    assert os.path.basename(mf) == f"manifest-v{t.current().version}.txt"
    listed = [ln for ln in open(mf).read().splitlines() if ln]
    live = {
        os.path.join(t.root, e["path"])
        for es in t.all_entries(t.current()).values()
        for e in es
    }
    assert set(listed) == live
    # DuckDB can read the manifest's files directly (the no-SQL path)
    n = duckdb.connect().execute(
        "SELECT count(*) FROM read_parquet($1)", [listed]
    ).fetchone()[0]
    assert n >= 2  # physical rows (pre-collapse) cover both keys


def test_scan_spec_shape(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("a", 1, "a1", "insert")]), "c0")
    t.compact("compact0")
    merge_into(t, _rows(spark, [("a", 2, "a2", "update")]), "c1")
    spec = scan_spec(t)
    assert spec["key"] == "url" and spec["order_col"] == "lsn"
    assert spec["snapshot_version"] == t.current().version
    kinds = {
        (bool(g["base_files"]), bool(g["delta_files"]))
        for g in spec["file_groups"]
    }
    # at least one group carries delta files (the live tail)
    assert any(d for _, d in kinds)
    import json

    json.dumps(spec)  # engine-neutral = JSON-serializable end to end


def test_reader_sql_with_lineage(spark):
    import duckdb

    import tempfile as _tf

    from pyspark.sql import functions as F

    from data_pipeline_spark.lake.interop import reader_sql
    from data_pipeline_spark.lake.merge import merge_into
    from data_pipeline_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, _tf.mkdtemp(prefix="lake_il_"),
        [("url", "string"), ("lsn", "bigint"), ("v", "string")],
        "url", 2, props={"lineage": "true"},
    )

    def _b(rows):
        return spark.createDataFrame(
            rows, "url string, lsn bigint, v string, op string")

    merge_into(t, _b([("u", 1, "a", "insert"), ("w", 2, "x", "insert")]), "c1")
    merge_into(t, _b([("u", 5, "b", "upsert")]), "c2")
    merge_into(t, _b([("w", 6, None, "delete")]), "c3")
    merge_into(t, _b([("w", 8, "y", "insert")]), "c4")

    def _check():
        want = sorted(
            (r.url, r.lsn, r.v, r._first_lsn)
            for r in t.read(with_lineage=True).collect()
        )
        got = sorted(
            tuple(r) for r in duckdb.connect().execute(
                reader_sql(t, with_lineage=True)).fetchall()
        )
        assert got == want, (got, want)

    _check()  # delta path: the exported fence-and-min fold
    t.compact(commit_key="k1")
    _check()  # compacted path: persisted lineage read straight off disk
    merge_into(t, _b([("u", 11, "c", "upsert")]), "c5")
    _check()  # mixed: base + fresh delta

    # guard: lineage export needs the property
    t2 = LakeTable.create(
        spark, _tf.mkdtemp(prefix="lake_il2_"),
        [("url", "string"), ("lsn", "bigint"), ("v", "string")], "url", 2)
    import pytest as _pt
    with _pt.raises(ValueError, match="lineage=true"):
        reader_sql(t2, with_lineage=True)
