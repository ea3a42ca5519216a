"""Embedding near-dup: the planted-true-positive fixture must actually
fire (round-2 verdict: a 0-rows==0-rows oracle pass proves nothing), and
the pairs must be exactly the planted clones at the chosen threshold."""

import duckdb
import pytest

from data_pipeline_spark.operators import similarity as sim
from tests.conftest import SF_SMOKE, SF_ORACLE


def _spark_pairs(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    return spark.sql(sim.embedding_near_dup_sql(sim.SPARK)).collect()


def test_planted_pairs_survive_and_verify(spark):
    rows = _spark_pairs(spark, SF_SMOKE)
    assert len(rows) > 0, "planted near-dups produced no pairs"
    for r in rows:
        # every surviving pair is (original, its planted clone): ids are
        # offset by exactly 1_000_000 and the exact dot clears threshold
        assert r.vec_b == r.vec_a + 1_000_000, (r.vec_a, r.vec_b)
        assert r.dot >= 950_000
    # banding recall on this corpus: all planted pairs land in the same
    # LSH bucket (the +1 nudge on one quantized coordinate flips no
    # hyperplane here) — pin it so a plane/threshold change that kills
    # recall gets noticed
    assert len(rows) == 20


def test_no_organic_false_positives_among_random_vectors(spark):
    rows = _spark_pairs(spark, SF_SMOKE)
    organic = [r for r in rows if r.vec_a < 1_000_000 and r.vec_b < 1_000_000]
    assert organic == []


def test_duckdb_oracle_agrees_and_is_nonempty(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/embeddings.parquet')"
    )
    duck = {
        (a, b, d)
        for a, b, d in con.execute(
            sim.embedding_near_dup_sql(sim.DUCK)
        ).fetchall()
    }
    assert len(duck) > 0
    spark_rows = {
        (r.vec_a, r.vec_b, r.dot) for r in _spark_pairs(spark, SF_ORACLE)
    }
    assert spark_rows == duck
