"""Hermetic statement execution: temp-view name collisions across
concurrent / interleaved engine operations can never cross relations.

Round-3's only red driver row (cdc_catalog_sql hash mismatch) was a
shared-session namespace hazard: several operations register a view
named ``pages`` for different physical tables, and a catalog SELECT
racing them could read another operation's relation. The fix is
structural — every statement that resolves fixed names runs on a child
session (session.hermetic_session), with caller DataFrames bridged in
via transient unique global views (session.bridge_views).

Reference analog: per-collection namespace isolation,
/root/reference/scripts/run_ingest_register.py:38-48.
"""

import tempfile
import threading

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.catalog import Catalog
from data_pipeline_spark.session import bridge_views, hermetic_session
from data_pipeline_spark.sql_merge import dml_sql

from conftest import SF_SMOKE


def _seed_cat(spark, prefix="cat_herm_"):
    cat = Catalog(spark, tempfile.mkdtemp(prefix=prefix))
    cat.sql(
        "CREATE TABLE pages (url STRING PRIMARY KEY, lsn BIGINT, "
        "score BIGINT, lang STRING) PARTITIONED BY (BUCKET(4, url))"
    )
    cat.sql(
        "INSERT INTO pages (url, lsn, score, lang) VALUES "
        + ", ".join(
            f"('u{i}', {i + 1}, {i * 10}, 'en')" for i in range(20)
        ),
        commit_key="seed",
    )
    return cat


def test_catalog_select_ignores_foreign_pages_view(spark):
    """A leftover/foreign temp view named after a catalog table must not
    shadow the table inside catalog.sql — the round-3 failure mode."""
    cat = _seed_cat(spark)
    decoy = spark.createDataFrame(
        [("x", 1, 999999, "zz")], "url string, lsn bigint, score bigint, lang string"
    )
    decoy.createOrReplaceTempView("pages")  # simulated pollution
    try:
        got = cat.sql(
            "SELECT count(*) AS n, sum(score) AS s FROM pages WHERE score >= 0"
        ).first()
        assert got["n"] == 20 and got["s"] == sum(i * 10 for i in range(20))
    finally:
        spark.catalog.dropTempView("pages")


def _globals(spark):
    # listTables("global_temp") also returns SESSION-LOCAL temp views
    # (Spark lists temp views in every database listing) — filter to
    # rows actually homed in the global_temp database
    return [
        t
        for t in spark.catalog.listTables("global_temp")
        if (t.namespace or [None])[0] == "global_temp"
    ]


def test_catalog_select_registers_nothing_on_caller_session(spark):
    cat = _seed_cat(spark)
    before = {t.name for t in spark.catalog.listTables()}
    cat.sql("SELECT url, score FROM pages WHERE score > 50").collect()
    after = {t.name for t in spark.catalog.listTables()}
    assert after == before  # zero residue, no 'pages' view appears
    assert _globals(spark) == []  # bridge residue


def test_sources_shadow_catalog_table_and_skip_fast_path(spark):
    """A caller-supplied source named like a catalog table SHADOWS it —
    on the scan path AND on the count(*)/min-max metadata fast path
    (which must not answer from the table the statement won't read)."""
    cat = _seed_cat(spark)
    cat.load("pages").compact("k", min_files=1)  # make fast path eligible
    src = spark.createDataFrame(
        [("a", 1, 7, "de"), ("b", 2, 9, "de")],
        "url string, lsn bigint, score bigint, lang string",
    )
    n = cat.sql("SELECT count(*) FROM pages", sources={"pages": src}).first()[0]
    assert n == 2
    mx = cat.sql(
        "SELECT max(score) FROM pages", sources={"pages": src}
    ).first()[0]
    assert mx == 9
    rows = cat.sql(
        "SELECT url FROM pages ORDER BY url", sources={"pages": src}
    ).collect()
    assert [r["url"] for r in rows] == ["a", "b"]


def test_interleaved_catalog_selects_and_dml_sources_never_cross(spark):
    """Threads hammer catalog.sql SELECTs while other threads run DMLs
    whose ``sources`` reuse the name ``pages`` for a different physical
    relation — every SELECT answer must equal the isolated answer."""
    cat = _seed_cat(spark)
    # one sink PER writer thread — concurrent commits to one table are
    # CAS-serialized by design (ConcurrentCommitError), which is not the
    # hazard under test here
    sinks = []
    for i in range(2):
        s = Catalog(spark, tempfile.mkdtemp(prefix=f"cat_sink{i}_"))
        s.sql(
            "CREATE TABLE mirror (url STRING PRIMARY KEY, lsn BIGINT, "
            "score BIGINT, lang STRING)"
        )
        sinks.append(s)
    decoy = spark.createDataFrame(
        [(f"d{i}", i + 1, -1, "xx") for i in range(5)],
        "url string, lsn bigint, score bigint, lang string",
    )
    expect = (20, sum(i * 10 for i in range(20)))
    errors: list = []

    def reader():
        try:
            for _ in range(6):
                r = cat.sql(
                    "SELECT count(*) AS n, sum(score) AS s FROM pages "
                    "WHERE score >= 0"
                ).first()
                assert (r["n"], r["s"]) == expect
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    def writer(i):
        try:
            for j in range(6):
                dml_sql(
                    "INSERT INTO mirror (url, lsn, score, lang) "
                    "SELECT url, lsn, score, lang FROM pages",
                    f"w{i}-{j}",
                    tables={"mirror": sinks[i].load("mirror")},
                    sources={"pages": decoy},
                )
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    ts = [threading.Thread(target=reader) for _ in range(2)] + [
        threading.Thread(target=writer, args=(i,)) for i in range(2)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errors == []
    # the DMLs really read THEIR source (the decoy), not the catalog table
    for s in sinks:
        got = {r["url"] for r in s.load("mirror").read().collect()}
        assert got == {f"d{i}" for i in range(5)}


def test_colliding_registry_entries_concurrently(spark):
    sf_dir = SF_SMOKE
    """The actual round-3 colliders from the registry, run concurrently
    on ONE session several times: cdc_catalog_sql must produce its
    isolated-run values every time."""
    from data_pipeline_spark import queries

    baseline = [
        tuple(r)
        for r in queries.REGISTRY["cdc_catalog_sql"]
        .spark(spark, sf_dir)
        .collect()
    ]
    errors: list = []

    def run(name):
        try:
            rows = [
                tuple(r)
                for r in queries.REGISTRY[name].spark(spark, sf_dir).collect()
            ]
            if name == "cdc_catalog_sql":
                assert rows == baseline, rows
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append((name, e))

    for _ in range(2):
        ts = [
            threading.Thread(target=run, args=(n,))
            for n in (
                "cdc_catalog_sql",
                "cdc_sql_insert",
                "cdc_sql_update_delete",
            )
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    assert errors == []


def test_queries_views_do_not_touch_caller_namespace(spark):
    sf_dir = SF_SMOKE
    from data_pipeline_spark import queries

    before = {t.name for t in spark.catalog.listTables()}
    queries.REGISTRY["cdc_changelog_project"].spark(spark, sf_dir).collect()
    after = {t.name for t in spark.catalog.listTables()}
    assert after == before
    assert "events" not in after and "changelog" not in after


def test_bridge_views_inlines_and_leaves_no_globals(spark):
    df = spark.createDataFrame([(1, "a")], "id bigint, v string")
    child = hermetic_session(spark)
    bridge_views(child, {"t": df})
    assert _globals(spark) == []
    assert child.sql("SELECT count(*) FROM t").first()[0] == 1
    # second reference still resolves (plan inlined, not text-resolved)
    assert child.sql("SELECT max(id) FROM t").first()[0] == 1
    with pytest.raises(Exception):
        spark.sql("SELECT * FROM t")


def test_count_rows_refuses_under_row_filters_and_catalog_falls_through(
    spark,
):
    """ADVICE r3 (high): the count(*) metadata fast path must not
    return the unfiltered live-row count on a row-filtered table."""
    from data_pipeline_spark import masking

    cat = _seed_cat(spark)
    t = cat.load("pages")
    t.compact("k", min_files=1)
    assert t.count_rows() == 20  # metadata plane, eligible
    masking.add_row_filter(t, "high_only", "score >= 100")
    with pytest.raises(ValueError, match="row filters"):
        cat.load("pages").count_rows()
    # the SQL front door falls through to the FILTERED scan
    n = cat.sql("SELECT count(*) FROM pages").first()[0]
    want = sum(1 for i in range(20) if i * 10 >= 100)
    assert n == want
    # raw physical count stays metadata-answerable
    assert cat.load("pages").count_rows(raw=True) == 20


def test_show_create_table_roundtrips_quoted_props(spark):
    """ADVICE r3 (medium): props whose values hold single quotes
    (generated columns, CHECKs) must emit escaped and re-parse."""
    cat = _seed_cat(spark)
    t = cat.load("pages")
    t.update_props(
        {
            "generated.domain": "split_part(url, '/', 3)",
            "check.lang_ok": "lang IN ('en', 'de')",
        }
    )
    ddl = cat.sql("SHOW CREATE TABLE pages").first()["createtab_stmt"]
    assert "''" in ddl  # escaped on emit
    cat2 = Catalog(spark, tempfile.mkdtemp(prefix="cat_rt_"))
    cat2.sql(ddl.replace("CREATE TABLE pages", "CREATE TABLE pages2"))
    props = cat2.load("pages2").current().props
    assert props["generated.domain"] == "split_part(url, '/', 3)"
    assert props["check.lang_ok"] == "lang IN ('en', 'de')"


def test_ctas_custom_sequence_field_collapses_on_it(spark):
    """ADVICE r3 (medium): CTAS with 'sequence.field' creates a table
    whose merges collapse and fence on THAT column — no lsn required
    anywhere in the schema."""
    cat = Catalog(spark, tempfile.mkdtemp(prefix="cat_seq_"))
    base = spark.createDataFrame(
        [("a", 1, "v1"), ("b", 1, "w1")],
        "url string, rev bigint, body string",
    )
    cat.sql(
        "CREATE TABLE docs PRIMARY KEY (url) "
        "TBLPROPERTIES ('sequence.field'='rev') AS "
        "SELECT url, rev, body FROM src",
        commit_key="ctas-1",
        sources={"src": base},
    )
    t = cat.load("docs")
    assert t.current().order_col == "rev"
    # batch with BOTH revisions of 'a' in one insert: the within-batch
    # collapse must pick rev=3, and read-time LWW must prefer rev over
    # any physical ordering
    upd = spark.createDataFrame(
        [("a", 3, "v3"), ("a", 2, "v2")],
        "url string, rev bigint, body string",
    )
    dml_sql(
        "INSERT INTO docs (url, rev, body) SELECT * FROM u",
        "i2",
        tables={"docs": t},
        sources={"u": upd},
    )
    got = {r["url"]: (r["rev"], r["body"]) for r in t.read().collect()}
    assert got["a"] == (3, "v3") and got["b"] == (1, "w1")


def test_winnowing_short_docs_still_fingerprint(spark):
    """ADVICE r3 (low): docs with fewer than w grams contribute the min
    over their available grams — exact duplicates of short docs match."""
    import duckdb

    from data_pipeline_spark.operators.dedup import DUCK, SPARK, winnowing_sql

    rows = [
        ("s1", "alpha beta gamma delta epsilon"),  # 5 words: k=4 -> 2 grams < w
        ("s2", "alpha beta gamma delta epsilon"),  # exact duplicate
        ("s3", "one two three four five six seven eight nine ten "
               "eleven twelve thirteen fourteen"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    child = hermetic_session(spark)
    bridge_views(child, {"docs": df})
    q = winnowing_sql(SPARK, "docs", k=4, w=4, min_shared=1)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in child.sql(q).collect()
    }
    assert ("s1", "s2") in got
    # oracle dialect agrees
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    oq = winnowing_sql(DUCK, "docs", k=4, w=4, min_shared=1)
    ogot = {(a, b) for a, b, *_ in con.execute(oq).fetchall()}
    assert ("s1", "s2") in ogot and ogot == got
