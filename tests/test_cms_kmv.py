"""Count-min grids and KMV set sketches (operators/sketches.py): merge
algebra, estimator guarantees (CMS never under-counts; KMV error bounds),
and DuckDB arithmetic parity."""

import duckdb
from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    KMV_K,
    cms_estimate,
    cms_estimate_duckdb_sql,
    cms_merge,
    cms_sketch,
    cms_sketch_duckdb_sql,
    kmv_estimate_py,
    kmv_intersection_py,
    kmv_merge,
    kmv_sketch,
    kmv_sketch_duckdb_sql,
)

SF_DIR = "/root/testdata/sf0.01"


def _events_domains(spark):
    return cl.changelog(spark, SF_DIR).select(
        F.regexp_extract("url", "https://([^/]+)/", 1).alias("domain"),
        "lsn",
    )


# -- count-min ---------------------------------------------------------------


def test_cms_merge_equals_one_shot(spark):
    ev = _events_domains(spark)
    whole = cms_sketch(ev, [], "domain")
    parts = [
        cms_sketch(ev.filter(F.col("lsn") % 3 == i), [], "domain")
        for i in range(3)
    ]
    merged = cms_merge(*parts)
    a = {(r["row"], r["cell"]): r["cnt"] for r in whole.collect()}
    b = {(r["row"], r["cell"]): r["cnt"] for r in merged.collect()}
    assert a == b and len(a) <= CMS_D * CMS_W


def test_cms_never_under_counts_and_is_tight_here(spark):
    ev = _events_domains(spark)
    grid = cms_sketch(ev, [], "domain")
    keys = ev.select("domain").distinct()
    est = {
        r["domain"]: r["est"]
        for r in cms_estimate(grid, keys, [], "domain").collect()
    }
    true = {
        r["domain"]: r["cnt"]
        for r in ev.groupBy("domain").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(true.values())
    for d, t in true.items():
        assert est[d] >= t  # the one-sided CMS guarantee
        # ε = e/w bound with d rows; generous integer form
        assert est[d] - t <= 3 * n // CMS_W + 1


def test_cms_duckdb_parity(spark):
    ev = _events_domains(spark)
    grid = cms_sketch(ev, [], "domain")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    con.execute(
        f"CREATE VIEW changelog AS ({cl.changelog_duckdb_sql('events')})"
    )
    src = (
        "SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS domain, lsn "
        "FROM changelog"
    )
    gsql = cms_sketch_duckdb_sql(src, [], "domain")
    duck_grid = set(con.execute(gsql).fetchall())
    assert {(r["row"], r["cell"], r["cnt"]) for r in grid.collect()} == \
        duck_grid
    esql = cms_estimate_duckdb_sql(
        gsql, f"SELECT DISTINCT domain FROM ({src})", [], "domain"
    )
    duck_est = set(con.execute(esql).fetchall())
    keys = ev.select("domain").distinct()
    spark_est = {
        (r["domain"], r["est"])
        for r in cms_estimate(grid, keys, [], "domain").collect()
    }
    assert spark_est == duck_est


def test_cms_weighted_counts_bytes(spark):
    ev = cl.changelog(spark, SF_DIR).select(
        F.regexp_extract("url", "https://([^/]+)/", 1).alias("domain"),
        F.octet_length("html").alias("nbytes"),
    )
    grid = cms_sketch(ev, [], "domain", weight_col="nbytes")
    est = {
        r["domain"]: r["est"]
        for r in cms_estimate(
            grid, ev.select("domain").distinct(), [], "domain"
        ).collect()
    }
    true = {
        r["domain"]: r["s"]
        for r in ev.groupBy("domain").agg(F.sum("nbytes").alias("s")).collect()
    }
    assert all(est[d] >= t for d, t in true.items())


# -- KMV ----------------------------------------------------------------------


def test_kmv_merge_equals_one_shot_and_overlapping_shards(spark):
    ev = _events_domains(spark).select(
        F.concat(F.col("domain"), F.lit("#"), F.col("lsn")).alias("v")
    )
    whole = kmv_sketch(ev, [], "v")
    # overlapping shards: thirds by lsn-ish hash, each shard repeated
    parts = [
        kmv_sketch(
            ev.filter(F.pmod(F.xxhash64("v"), F.lit(3)) <= i), [], "v"
        )
        for i in range(3)
    ]
    merged = kmv_merge(*parts)
    assert [r["hval"] for r in whole.orderBy("pos").collect()] == \
        [r["hval"] for r in merged.orderBy("pos").collect()]


def test_kmv_estimate_within_bounds(spark):
    ev = _events_domains(spark).select(
        F.concat(F.col("domain"), F.lit("#"), F.col("lsn")).alias("v")
    )
    n = ev.distinct().count()
    hv = [r["hval"] for r in kmv_sketch(ev, [], "v").collect()]
    est = kmv_estimate_py(hv)
    # stderr ~ 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
    assert abs(est - n) / n < 0.5
    # exact below k
    small = ev.limit(KMV_K - 5)
    hv_small = [r["hval"] for r in kmv_sketch(small, [], "v").collect()]
    assert kmv_estimate_py(hv_small) == float(small.distinct().count())


def test_kmv_intersection_estimate(spark):
    base = spark.range(4000).selectExpr("concat('v', id) AS v", "id")
    a = base.filter("id < 2800")
    b = base.filter("id >= 1200")  # |A∩B| = 1600, |A∪B| = 4000
    ha = [r["hval"] for r in kmv_sketch(a, [], "v").collect()]
    hb = [r["hval"] for r in kmv_sketch(b, [], "v").collect()]
    est = kmv_intersection_py(ha, hb)
    assert abs(est - 1600) / 1600 < 0.6
    # disjoint sets → 0
    d1 = [r["hval"] for r in kmv_sketch(base.filter("id < 100"), [], "v").collect()]
    d2 = [r["hval"] for r in kmv_sketch(base.filter("id >= 3900"), [], "v").collect()]
    assert kmv_intersection_py(d1, d2) == 0.0


def test_kmv_duckdb_parity(spark):
    ev = _events_domains(spark).select("domain").distinct()
    sk = kmv_sketch(ev, [], "domain")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    con.execute(
        f"CREATE VIEW changelog AS ({cl.changelog_duckdb_sql('events')})"
    )
    dq = con.execute(
        kmv_sketch_duckdb_sql(
            "SELECT DISTINCT regexp_extract(url, 'https://([^/]+)/', 1) "
            "AS domain FROM changelog",
            [],
            "domain",
        )
    ).fetchall()
    assert {(r["pos"], r["hval"]) for r in sk.collect()} == set(dq)
