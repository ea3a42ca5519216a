"""Field-ID schema evolution (Iceberg identity semantics).

Alignment of old files to the current schema matches columns by FIELD ID,
not by name: a rename keeps reading old bytes under the new name with no
data rewrite, and a dropped-then-re-added name gets a FRESH id so pre-drop
bytes can never resurface (previously a documented caveat requiring a
compaction between drop and re-add). Reference analog: per-item schema
migration in /root/reference/scripts/convert_v1_s2.py rewrites data per
item; here evolution is metadata-only and id-aligned at read time.
"""

import glob
import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable


def _mk(spark, n_buckets=4):
    return LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_fid_"),
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("v", "string"), ("extra", "string")],
        "url", n_buckets,
    )


def _rows(spark, data, extra_name="extra"):
    df = spark.createDataFrame(
        data,
        f"url string, lsn bigint, warc_ts string, v string, "
        f"{extra_name} string, op string",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


TS = "2026-01-01 00:00:00"


def test_rename_reads_old_files_under_new_name(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "x1", "upsert")]), "c1")
    t.evolve_schema(rename_columns={"extra": "note"}, commit_key="ren")
    cols = t.read().columns
    assert "note" in cols and "extra" not in cols
    # pre-rename file bytes surface under the new name — no rewrite happened
    assert {(r["url"], r["note"]) for r in t.read().collect()} == {("u1", "x1")}
    # writes after the rename use the new name and merge with old files
    merge_into(
        t, _rows(spark, [("u2", 2, TS, "b", "x2", "upsert")], "note"), "c2"
    )
    got = {(r["url"], r["note"]) for r in t.read().collect()}
    assert got == {("u1", "x1"), ("u2", "x2")}


def test_drop_then_readd_is_clean_without_compaction(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "old-value", "upsert")]), "c1")
    t.evolve_schema(drop_columns=["extra"], commit_key="e1")
    # NO compaction between drop and re-add: the re-added name gets a
    # fresh field id, so the pre-drop bytes in the surviving file must
    # NOT resurface (the old name-based alignment would have leaked them).
    t.evolve_schema(add_columns={"extra": "string"}, commit_key="e2")
    assert [r["extra"] for r in t.read().collect()] == [None]


def test_rename_guards(spark):
    t = _mk(spark)
    with pytest.raises(ValueError, match="structural"):
        t.evolve_schema(rename_columns={"url": "u"})
    with pytest.raises(KeyError, match="no such column"):
        t.evolve_schema(rename_columns={"nope": "x"})
    with pytest.raises(KeyError, match="target exists"):
        t.evolve_schema(rename_columns={"extra": "v"})
    t.update_props({"schema.compat": "backward"})
    with pytest.raises(ValueError, match="refuses drop-column and"):
        t.evolve_schema(rename_columns={"extra": "note"})
    # explicit override still works
    t.evolve_schema(rename_columns={"extra": "note"}, compat="none")
    assert "note" in dict(t.schema_fields(t.current()))


def test_rename_then_rename_back_keeps_identity(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "x1", "upsert")]), "c1")
    t.evolve_schema(rename_columns={"extra": "note"}, commit_key="r1")
    t.evolve_schema(rename_columns={"note": "extra"}, commit_key="r2")
    # same id throughout: the original bytes still read under the
    # round-tripped name
    assert [r["extra"] for r in t.read().collect()] == ["x1"]


def test_legacy_two_element_schemas_read_unchanged(spark):
    """Tables written before field ids (schemas entries [name, ddl])
    derive ids by first-appearance name matching — byte-identical reads."""
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "x1", "upsert")]), "c1")
    t.evolve_schema(add_columns={"score": "bigint"}, commit_key="e1")
    want = {(r["url"], r["v"], r["extra"]) for r in t.read().collect()}
    # strip ids from every persisted snapshot, simulating a legacy table
    for p in glob.glob(os.path.join(t.root, "_snapshots", "v*.json")):
        with open(p) as f:
            doc = json.load(f)
        doc["schemas"] = {
            sv: [[e[0], e[1]] for e in entries]
            for sv, entries in doc["schemas"].items()
        }
        with open(p, "w") as f:
            json.dump(doc, f)
    t2 = LakeTable(spark, t.root)
    snap = t2.current()
    ids, nxt = t2._all_field_ids(snap)
    # name-stable ids across schema versions, densely allocated
    assert ids["0"]["extra"] == ids["1"]["extra"]
    assert nxt == len(ids["1"])
    got = {(r["url"], r["v"], r["extra"]) for r in t2.read().collect()}
    assert got == want


def test_initial_default_reads_from_pre_add_files_only(spark):
    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "x1", "upsert")]), "c1")
    t.evolve_schema(
        add_columns={"fetch_ms": "bigint"}, defaults={"fetch_ms": 7},
        commit_key="e1",
    )
    # pre-add file: the default, not NULL
    assert [r["fetch_ms"] for r in t.read().collect()] == [7]
    # post-add writer omitting the column stores a REAL null → reads NULL
    merge_into(t, _rows(spark, [("u2", 2, TS, "b", "x2", "upsert")]), "c2")
    got = {r["url"]: r["fetch_ms"] for r in t.read().collect()}
    assert got == {"u1": 7, "u2": None}
    # default survives a rename and later evolutions
    t.evolve_schema(rename_columns={"fetch_ms": "latency_ms"}, commit_key="e2")
    t.evolve_schema(add_columns={"other": "string"}, commit_key="e3")
    got = {r["url"]: r["latency_ms"] for r in t.read().collect()}
    assert got == {"u1": 7, "u2": None}
    # drop kills the default; a fresh re-add does NOT inherit it
    t.evolve_schema(drop_columns=["latency_ms"], commit_key="e4")
    t.evolve_schema(add_columns={"latency_ms": "bigint"}, commit_key="e5")
    assert {r["latency_ms"] for r in t.read().collect()} == {None}


def test_default_guards(spark):
    t = _mk(spark)
    with pytest.raises(KeyError, match="not being added"):
        t.evolve_schema(add_columns={"a": "bigint"}, defaults={"v": "x"})
    with pytest.raises(ValueError, match="scalar"):
        t.evolve_schema(add_columns={"a": "bigint"}, defaults={"a": [1]})


def test_reader_sql_with_initial_default(spark):
    import duckdb

    from data_pipeline_spark.lake.interop import reader_sql

    t = _mk(spark)
    merge_into(t, _rows(spark, [("u1", 1, TS, "a", "x1", "upsert")]), "c1")
    t.evolve_schema(
        add_columns={"score": "double"}, defaults={"score": 1.5},
        commit_key="e1",
    )
    merge_into(t, _rows(spark, [("u2", 2, TS, "b", "x2", "upsert")]), "c2")
    df = t.read()
    cols = sorted(df.columns)
    want = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
    cur = duckdb.connect().execute(reader_sql(t))
    names = [d[0] for d in cur.description]
    assert sorted(names) == cols
    idx = [names.index(c) for c in cols]
    got = sorted(tuple(str(r[i]) for i in idx) for r in cur.fetchall())
    assert got == want


def test_reader_sql_across_rename(spark):
    """External-reader export stays byte-equal to read() when old files
    carry a pre-rename column name (id alignment in portable SQL)."""
    import duckdb

    t = _mk(spark)
    merge_into(t, _rows(spark, [
        ("u1", 1, TS, "a", "x1", "upsert"),
        ("u2", 1, TS, "b", "x2", "upsert"),
    ]), "c1")
    t.evolve_schema(rename_columns={"extra": "note"}, commit_key="ren")
    merge_into(
        t, _rows(spark, [("u2", 2, TS, "b2", "y2", "upsert")], "note"), "c2"
    )
    from data_pipeline_spark.lake.interop import reader_sql

    df = t.read()
    cols = sorted(df.columns)
    want = sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )
    cur = duckdb.connect().execute(reader_sql(t))
    names = [d[0] for d in cur.description]
    assert sorted(names) == cols
    idx = [names.index(c) for c in cols]
    got = sorted(tuple(str(r[i]) for i in idx) for r in cur.fetchall())
    assert got == want
