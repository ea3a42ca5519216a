"""CTAS (CREATE TABLE ... PRIMARY KEY (...) AS SELECT) and
SHOW CREATE TABLE: schema inference, crash-safe resume, exactly-once
replay, and DDL round-trip."""

import tempfile

import pytest

from data_pipeline_spark.lake.catalog import Catalog


def _cat(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="cat_ctas_"))
    cat.sql(
        "CREATE TABLE pages (url STRING PRIMARY KEY, lsn BIGINT, "
        "score BIGINT, lang STRING) PARTITIONED BY (BUCKET(4, url))"
    )
    cat.sql(
        "INSERT INTO pages (url, lsn, score, lang) VALUES "
        "('a', 1, 10, 'en'), ('b', 2, 20, 'de'), ('c', 3, 30, 'en')",
        commit_key="seed",
    )
    return cat


def test_ctas_creates_and_fills(spark):
    cat = _cat(spark)
    t = cat.sql(
        "CREATE TABLE en_pages PRIMARY KEY (url) "
        "PARTITIONED BY (BUCKET(2, url)) "
        "AS SELECT url, lsn, score * 2 AS dscore FROM pages "
        "WHERE lang = 'en'",
        commit_key="c1",
    )
    got = {r.url: (r.lsn, r.dscore) for r in t.read().collect()}
    assert got == {"a": (1, 20), "c": (3, 60)}
    assert "en_pages" in cat.table_names()
    # replay of the whole statement is a no-op
    v = t.current().version
    cat.sql(
        "CREATE TABLE en_pages PRIMARY KEY (url) "
        "PARTITIONED BY (BUCKET(2, url)) "
        "AS SELECT url, lsn, score * 2 AS dscore FROM pages "
        "WHERE lang = 'en'",
        commit_key="c1",
    )
    assert cat.load("en_pages").current().version == v


def test_ctas_guardrails(spark):
    cat = _cat(spark)
    with pytest.raises(ValueError, match="commit_key"):
        cat.sql("CREATE TABLE x PRIMARY KEY (url) AS SELECT url, lsn "
                "FROM pages")
    with pytest.raises(KeyError, match="PRIMARY KEY"):
        cat.sql("CREATE TABLE x PRIMARY KEY (nope) AS SELECT url, lsn "
                "FROM pages", commit_key="k")
    with pytest.raises(ValueError, match="order column"):
        cat.sql("CREATE TABLE x PRIMARY KEY (url) AS SELECT url, score "
                "FROM pages", commit_key="k")
    # existing table with a DIFFERENT schema refuses (no silent merge)
    with pytest.raises(FileExistsError, match="different schema"):
        cat.sql("CREATE TABLE pages PRIMARY KEY (url) "
                "AS SELECT url, lsn FROM pages", commit_key="k")


def test_show_create_table_round_trips(spark):
    cat = _cat(spark)
    ddl = cat.sql("SHOW CREATE TABLE pages").first()["createtab_stmt"]
    assert "url STRING PRIMARY KEY" in ddl and "BUCKET(4, url)" in ddl
    # the emitted text parses under the catalog's own grammar
    cat2 = Catalog(spark, tempfile.mkdtemp(prefix="cat_ctas2_"))
    cat2.sql(ddl)
    t2 = cat2.load("pages")
    assert [c for c, _ in t2.schema_fields(t2.current())] == [
        "url", "lsn", "score", "lang"
    ]
    assert t2.current().n_buckets == 4
