"""Named-table catalog (lake/catalog.py): directory-of-tables lifecycle,
restricted DDL, and the SQL front door routing to DML / SELECT."""

import os
import tempfile

import pytest

from data_pipeline_spark.lake.catalog import Catalog
from data_pipeline_spark.lake.merge import merge_into


def _cat(spark):
    return Catalog(spark, tempfile.mkdtemp(prefix="catalog_"))


DDL = """
CREATE TABLE pages (
  url string PRIMARY KEY,
  lsn bigint,
  v string,
  score bigint
) PARTITIONED BY (BUCKET(4, url))
  TBLPROPERTIES ('owner'='test', 'sequence.field'='lsn')
"""


def _seed(spark, cat):
    cat.sql(DDL)
    t = cat.load("pages")
    merge_into(t, spark.createDataFrame(
        [("a", 1, "a1", 10, "insert"),
         ("b", 2, "b1", 20, "insert"),
         ("c", 3, "c1", 30, "insert")],
        "url string, lsn bigint, v string, score bigint, op string",
    ), "seed")
    return t


def test_create_list_load_and_duplicate_refused(spark):
    cat = _cat(spark)
    t = cat.sql(DDL)
    snap = t.current()
    assert snap.key == "url" and snap.order_col == "lsn"
    assert snap.n_buckets == 4 and snap.props["owner"] == "test"
    assert [n for n, _ in t.schema_fields(snap)] == ["url", "lsn", "v", "score"]
    assert cat.table_names() == ["pages"]
    assert cat.table_exists("pages") and not cat.table_exists("nope")
    with pytest.raises(FileExistsError):
        cat.sql(DDL)
    with pytest.raises(KeyError):
        cat.load("nope")


def test_sql_select_and_dml_route_through_catalog(spark):
    cat = _cat(spark)
    _seed(spark, cat)
    got = {
        r["url"]: r["score"]
        for r in cat.sql("SELECT url, score FROM pages WHERE score >= 20").collect()
    }
    assert got == {"b": 20, "c": 30}
    with pytest.raises(ValueError, match="needs a commit_key"):
        cat.sql("UPDATE pages SET v = 'x'")
    cat.sql("DELETE FROM pages WHERE score = 20", commit_key="d1")
    # views are snapshot-pinned at call time; a fresh sql() re-registers
    assert {r["url"] for r in cat.sql("SELECT url FROM pages").collect()} == {
        "a", "c",
    }
    cat.sql(
        "INSERT INTO pages (url, v, score) VALUES ('z', 'z1', 99)",
        commit_key="i1",
    )
    assert cat.sql("SELECT max(score) m FROM pages").first()["m"] == 99


def test_alter_statements_map_to_schema_evolution(spark):
    cat = _cat(spark)
    t = _seed(spark, cat)
    cat.sql("ALTER TABLE pages ADD COLUMNS (rank int DEFAULT 7, note string)")
    row = cat.sql("SELECT rank, note FROM pages WHERE url='a'").first()
    assert (row["rank"], row["note"]) == (7, None)  # initial default
    cat.sql("ALTER TABLE pages ALTER COLUMN rank TYPE bigint")
    cat.sql("ALTER TABLE pages RENAME COLUMN note TO remark")
    cat.sql("ALTER TABLE pages DROP COLUMN remark")
    names = [n for n, _ in t.schema_fields(t.current())]
    assert names == ["url", "lsn", "v", "score", "rank"]
    assert dict(t.schema_fields(t.current()))["rank"] == "bigint"
    cat.sql("ALTER TABLE pages SET TBLPROPERTIES ('owner'='ops')")
    assert t.current().props["owner"] == "ops"


def test_drop_rename_and_trash(spark):
    cat = _cat(spark)
    _seed(spark, cat)
    cat.sql("ALTER TABLE pages RENAME TO pages2")
    assert cat.table_names() == ["pages2"]
    assert cat.sql("SELECT count(*) c FROM pages2").first()["c"] == 3
    dest = cat.sql("DROP TABLE pages2")
    assert cat.table_names() == [] and os.path.exists(dest)  # trashed
    cat.sql(DDL)
    assert cat.sql("DROP TABLE pages PURGE") is None
    assert cat.table_names() == []


def test_ddl_guardrails(spark):
    cat = _cat(spark)
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        cat.sql("CREATE TABLE t (url string, lsn bigint)")
    with pytest.raises(ValueError, match="must be the PRIMARY KEY"):
        cat.sql(
            "CREATE TABLE t (url string PRIMARY KEY, lsn bigint) "
            "PARTITIONED BY (BUCKET(4, lsn))"
        )
    with pytest.raises(ValueError, match="order column"):
        cat.sql("CREATE TABLE t (url string PRIMARY KEY, v string)")
    with pytest.raises(ValueError, match="bad table name"):
        cat.load("../escape")
    cat.sql(DDL)
    with pytest.raises(ValueError, match="unsupported ALTER"):
        cat.sql("ALTER TABLE pages CLUSTER BY (url)")
    with pytest.raises(FileExistsError):
        cat.sql("CREATE TABLE pages2 (url string PRIMARY KEY, lsn bigint)")
        cat.rename_table("pages", "pages2")


def test_metadata_tables_and_time_travel_sugar(spark):
    cat = _cat(spark)
    t = _seed(spark, cat)
    v1 = t.current().version
    cat.sql("DELETE FROM pages WHERE url = 'c'", commit_key="d1")
    # $files / $partitions: manifest-derived, no data IO
    files = cat.sql(
        "SELECT kind, count(*) n FROM pages$files GROUP BY kind"
    ).collect()
    assert {r["kind"] for r in files} <= {"base", "delta"}
    parts = cat.sql(
        "SELECT sum(n_files) s FROM `pages$partitions`"
    ).first()["s"]
    assert parts == sum(r["n"] for r in files)
    # $history: one row per snapshot
    hist = cat.sql("SELECT count(*) c FROM pages$history").first()["c"]
    assert hist == len(t.snapshot_log())
    # VERSION AS OF: pre-delete state still has c
    got = cat.sql(
        f"SELECT url FROM pages VERSION AS OF {v1} ORDER BY url"
    ).collect()
    assert [r["url"] for r in got] == ["a", "b", "c"]
    assert {r["url"] for r in cat.sql("SELECT url FROM pages").collect()} == {
        "a", "b",
    }


def test_show_and_describe(spark):
    cat = _cat(spark)
    _seed(spark, cat)
    assert [r["table_name"] for r in cat.sql("SHOW TABLES").collect()] == [
        "pages",
    ]
    props = {r["key"]: r["value"]
             for r in cat.sql("SHOW TBLPROPERTIES pages").collect()}
    assert props["owner"] == "test"
    cat.sql("ALTER TABLE pages ADD COLUMNS (rank int DEFAULT 7)")
    d = {r["col_name"]: r for r in cat.sql("DESCRIBE pages").collect()}
    assert d["url"]["role"] == "primary key"
    assert d["lsn"]["role"] == "order"
    assert d["rank"]["initial_default"] == "7"
    assert d["rank"]["field_id"] == 4  # fresh id after the 4 v0 columns
    with pytest.raises(ValueError, match="unparseable SHOW"):
        cat.sql("SHOW PARTITIONS pages")


def test_maintenance_verbs(spark):
    cat = _cat(spark)
    t = _seed(spark, cat)
    merge_into(t, spark.createDataFrame(
        [("a", 5, "a2", 11, "upsert")],
        "url string, lsn bigint, v string, score bigint, op string",
    ), "more")
    # OPTIMIZE folds the delta tail; idempotent on the commit key
    snap = cat.sql("OPTIMIZE pages", commit_key="opt-1")
    assert snap.summary["op"] == "compact"
    v = t.current().version
    cat.sql("OPTIMIZE pages", commit_key="opt-1")
    assert t.current().version == v
    # ZORDER variant clusters
    snap = cat.sql("OPTIMIZE pages ZORDER BY (score, lsn)", commit_key="opt-2")
    assert snap.summary.get("zorder") is True
    # CALL expire_snapshots then VACUUM (dry run first: no deletion)
    expired = cat.sql("CALL expire_snapshots(pages, keep_last => 1)")
    assert expired, "older versions should expire"
    n_dry = cat.sql("VACUUM pages RETAIN 0 HOURS DRY RUN")
    n = cat.sql("VACUUM pages")
    assert n == n_dry > 0
    got = {r["url"]: r["v"] for r in cat.sql("SELECT url, v FROM pages").collect()}
    assert got == {"a": "a2", "b": "b1", "c": "c1"}
    # CALL run_maintenance executes a policy round
    rep = cat.sql("CALL run_maintenance(pages)", commit_key="mx-1")
    assert "compact_buckets" in rep
    # guards
    with pytest.raises(ValueError, match="commit_key"):
        cat.sql("OPTIMIZE pages")
    with pytest.raises(ValueError, match="unknown procedure"):
        cat.sql("CALL frobnicate(pages)")
    with pytest.raises(ValueError, match="unparseable CALL argument"):
        cat.sql("CALL expire_snapshots(pages, keep_last => x)")


def test_optimize_append_mode_routes_files_only(spark):
    cat = _cat(spark)
    cat.sql("""
    CREATE TABLE patches (
      url string PRIMARY KEY,
      lsn bigint,
      v string,
      op string
    ) PARTITIONED BY (BUCKET(2, url))
      TBLPROPERTIES ('merge.mode'='patch', 'merge.patch.cols'='v')
    """)
    t = cat.load("patches")
    for i in range(3):
        t.commit_delta(spark.createDataFrame(
            [(f"u{i}", i, f"v{i}", "insert")],
            "url string, lsn bigint, v string, op string",
        ), f"c{i}")
    n_rows = t.read(raw=True).count()
    cat.sql("OPTIMIZE patches", commit_key="opt-a")
    assert t.read(raw=True).count() == n_rows  # events preserved verbatim
    with pytest.raises(ValueError, match="files-only"):
        cat.sql("OPTIMIZE patches ZORDER BY (lsn)", commit_key="opt-b")


def test_call_rollback_to_version(spark):
    cat = _cat(spark)
    t = _seed(spark, cat)
    v0 = t.current().version
    merge_into(t, spark.createDataFrame(
        [("a", 9, "a9", 99, "upsert")],
        "url string, lsn bigint, v string, score bigint, op string",
    ), "later")
    assert {r["v"] for r in cat.sql("SELECT v FROM pages WHERE url='a'").collect()} == {"a9"}
    cat.sql(f"CALL rollback_to_version(pages, version => {v0})",
            commit_key="rb-1")
    assert {r["v"] for r in cat.sql("SELECT v FROM pages WHERE url='a'").collect()} == {"a1"}
    # idempotent; history intact
    head = t.current().version
    cat.sql(f"CALL rollback_to_version(pages, version => {v0})",
            commit_key="rb-1")
    assert t.current().version == head
    with pytest.raises(ValueError, match="version => n"):
        cat.sql("CALL rollback_to_version(pages)", commit_key="rb-2")


def test_tags_cdf_and_tag_time_travel(spark):
    cat = _cat(spark)
    t = _seed(spark, cat)
    v0 = t.current().version
    cat.sql("CALL create_tag(pages, name => 'seeded')")
    merge_into(t, spark.createDataFrame(
        [("a", 9, "a9", 99, "upsert"), ("d", 10, "d1", 40, "insert")],
        "url string, lsn bigint, v string, score bigint, op string",
    ), "later")
    v1 = t.current().version
    # tag time travel in SELECT
    got = {r["url"]: r["v"] for r in cat.sql(
        "SELECT url, v FROM pages VERSION AS OF 'seeded'").collect()}
    assert got == {"a": "a1", "b": "b1", "c": "c1"}
    # CDF sugar: net changes between the tagged version and head
    ch = {(r["url"], r["op"]) for r in cat.sql(
        f"SELECT * FROM table_changes('pages', {v0}, {v1})").collect()}
    assert ch == {("a", "update"), ("d", "insert")}
    # tags survive expire; remove_tag releases
    cat.sql("CALL expire_snapshots(pages, keep_last => 1)")
    assert cat.sql("SELECT count(*) FROM pages VERSION AS OF 'seeded'"
                   ).first()[0] == 3
    cat.sql("CALL remove_tag(pages, name => 'seeded')")
    assert t.tags() == {}
    with pytest.raises(ValueError, match="needs name"):
        cat.sql("CALL create_tag(pages)")


def test_alter_add_drop_constraint(spark):
    cat = _cat(spark)
    t = _seed(spark, cat)
    cat.sql("ALTER TABLE pages ADD CONSTRAINT pos_score CHECK (score > 0)")
    from data_pipeline_spark import constraints
    assert constraints.checks(t) == {"pos_score": "score > 0"}
    # apply-boundary enforcement: a violating batch refuses pre-commit
    with pytest.raises(constraints.CheckViolation):
        cat.sql("INSERT INTO pages VALUES ('z', 9, 'zz', -5)",
                commit_key="bad")
    # existing-data validation refuses a retroactively-violated add
    with pytest.raises(ValueError):
        cat.sql("ALTER TABLE pages ADD CONSTRAINT impossible CHECK (score > 1000)")
    cat.sql("ALTER TABLE pages DROP CONSTRAINT pos_score")
    assert constraints.checks(t) == {}
    cat.sql("INSERT INTO pages VALUES ('z', 9, 'zz', -5)", commit_key="ok")
    assert cat.sql("SELECT score FROM pages WHERE url='z'").first()[0] == -5
