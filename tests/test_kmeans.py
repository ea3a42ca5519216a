"""In-engine k-means: the looped-DataFrame trainer and the unrolled SQL
CTE form produce identical integer codebooks, cluster sizes are sane,
and the trained-IVF query agrees with DuckDB (cross-engine exactness of
the whole train+serve pipeline)."""

import duckdb
import pytest

from tests.conftest import SF_SMOKE

from data_pipeline_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_loop_trainer_equals_unrolled_sql(spark, emb):
    k, iters = 8, 2
    loop_cents = sim.kmeans_train(emb, k=k, iters=iters)
    cte, final = sim.kmeans_cte(sim.SPARK, "embeddings", k=k, iters=iters)
    emb.createOrReplaceTempView("embeddings")
    rows = spark.sql(
        f"WITH {cte} SELECT cid, ce FROM {final} ORDER BY cid"
    ).collect()
    sql_cents = {r.cid: list(r.ce) for r in rows}
    # SQL form drops empty clusters; every surviving cid must match the
    # loop form exactly (same init, same integer arithmetic).
    assert sql_cents, "no clusters survived"
    for cid, ce in sql_cents.items():
        assert ce == loop_cents[cid], f"cid {cid} diverged"


def test_kmeans_refines_partition(spark, emb):
    """After 2 rounds every vector still belongs to exactly one cluster
    and the assignment is total (counts sum to the corpus size)."""
    emb.createOrReplaceTempView("embeddings")
    rows = spark.sql(sim.kmeans_summary_sql(sim.SPARK)).collect()
    assert sum(r.n_members for r in rows) == emb.count()
    assert len(rows) >= 2  # the init points do spread the tiny corpus


def test_kmeans_sql_matches_duckdb(spark, emb):
    emb.createOrReplaceTempView("embeddings")
    sp = sorted(
        tuple(r) for r in spark.sql(sim.kmeans_summary_sql(sim.SPARK)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    )
    dk = sorted(
        tuple(r) for r in con.execute(sim.kmeans_summary_sql(sim.DUCK)).fetchall()
    )
    assert sp == dk


def test_ivf_trained_matches_duckdb(spark, emb):
    emb.createOrReplaceTempView("embeddings")
    sp = sorted(
        tuple(r)
        for r in spark.sql(sim.ann_ivf_trained_sql(sim.SPARK)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    )
    dk = sorted(
        tuple(r)
        for r in con.execute(sim.ann_ivf_trained_sql(sim.DUCK)).fetchall()
    )
    assert sp == dk and len(sp) > 0
