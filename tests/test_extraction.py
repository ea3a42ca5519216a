"""The byte-identical extraction invariant: pandas UDF == Spark SQL
expression == DuckDB, per url (input_hint's per-row invariant)."""

import duckdb
from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.extraction import (
    extract_text,
    extract_text_duckdb,
    extract_text_sql,
)
from tests.conftest import SF_SMOKE


def test_udf_matches_sql_expression(spark):
    log = cl.changelog(spark, SF_SMOKE)
    n_bad = (
        log.withColumn("t_udf", extract_text("html"))
        .withColumn("t_sql", extract_text_sql("html"))
        .filter(F.col("t_udf") != F.col("t_sql"))
        .count()
    )
    assert n_bad == 0


def test_udf_matches_duckdb_bytes(spark):
    log = cl.changelog(spark, SF_SMOKE)
    sp = {
        r.lsn: r.h
        for r in log.select(
            "lsn", F.sha2(extract_text("html"), 256).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')"
    )
    dk = dict(
        con.execute(
            f"WITH changelog AS ({cl.changelog_duckdb_sql('events')}) "
            f"SELECT lsn, sha256({extract_text_duckdb('html')}) FROM changelog"
        ).fetchall()
    )
    assert sp == dk


def test_extraction_handles_edge_html(spark):
    rows = [
        (b"",),
        (b"<html></html>",),
        (b"no tags at all",),
        (b"<p>a</p><p>b</p>",),
        (b"<a href='x>y'>weird</a> trailing  spaces  ",),
    ]
    df = spark.createDataFrame(rows, "html binary")
    got = [
        r.t
        for r in df.select(extract_text("html").alias("t")).collect()
    ]
    assert got == ["", "", "no tags at all", "a b", "y'>weird trailing spaces"]
