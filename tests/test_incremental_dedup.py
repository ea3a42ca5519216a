"""Incremental near-dup vs the one-shot batch sweep
(operators/incremental_dedup.py): per-batch decisions against the
persisted signature store must union to exactly the batch plan's pairs,
with idempotent store commits and no self-pairs under redelivery."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.operators import dedup as dd
from data_pipeline_spark.operators.incremental_dedup import SignatureStore
from tests.conftest import SF_SMOKE


def _pair_set(df):
    return {
        (int(r["doc_a"]), int(r["doc_b"]), r["jacc_ppm"]) for r in df.collect()
    }


def _batch_plan_pairs(spark):
    return spark.sql(
        dd.minhash_near_dup_sql(
            dd.SPARK, n_hashes=32, n_bands=8, fast=True, min_ppm=500_000
        )
    )


def test_incremental_union_equals_batch_sweep(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    hi = docs.agg(F.max("doc_id")).first()[0]
    store = SignatureStore(spark, tempfile.mkdtemp(prefix="sig_t_"))
    got = set()
    cuts = [(-1, hi // 3), (hi // 3, 2 * hi // 3), (2 * hi // 3, hi)]
    for i, (lo, up) in enumerate(cuts):
        batch = docs.filter((F.col("doc_id") > lo) & (F.col("doc_id") <= up))
        got |= _pair_set(store.process_batch(batch, docs, f"b{i}"))
    want = _pair_set(_batch_plan_pairs(spark))
    assert got == want and len(want) > 0


def _tiny(spark, rows):
    # (doc_id, text): planted near-dups share a long common body.
    return spark.createDataFrame(rows, "doc_id bigint, text string")


BODY = "the quick brown fox jumps over the lazy dog again and again " * 4


def test_cross_batch_pair_found_via_store(spark):
    store = SignatureStore(spark, tempfile.mkdtemp(prefix="sig_t_"))
    b0 = _tiny(spark, [(1, BODY + "alpha"), (2, "totally unrelated words here " * 6)])
    b1 = _tiny(spark, [(10, BODY + "omega")])
    corpus = b0.unionByName(b1)
    p0 = store.process_batch(b0, corpus, "b0")
    assert p0.count() == 0  # no in-batch near-dups
    p1 = store.process_batch(b1, corpus, "b1").collect()
    # The batch-1 doc pairs with the STORED batch-0 doc: the store, not
    # the corpus text, generated the candidate.
    assert {(r["doc_a"], r["doc_b"]) for r in p1} == {("1", "10")}
    assert all(r["jacc_ppm"] >= 500_000 for r in p1)


def test_store_commit_idempotent_and_no_self_pairs(spark):
    store = SignatureStore(spark, tempfile.mkdtemp(prefix="sig_t_"))
    b0 = _tiny(spark, [(1, BODY + "alpha"), (2, BODY + "beta")])
    p0 = _pair_set(store.process_batch(b0, b0, "b0"))
    assert p0 and all(a != b for a, b, _ in p0)
    v = store.table.current().version
    # Exact redelivery (same commit key): store unchanged.
    store.process_batch(b0, b0, "b0")
    assert store.table.current().version == v
    # Overlapping redelivery under a NEW key: the store already holds
    # these ids — the cross join's self-guard must not pair a doc with
    # itself, and the store stays one row per doc.
    p_again = store.process_batch(b0, b0, "b0-redelivered")
    assert all(r["doc_a"] != r["doc_b"] for r in p_again.collect())
    assert store.table.read().count() == 2


def test_store_schema_params_pinned(spark):
    root = tempfile.mkdtemp(prefix="sig_t_")
    SignatureStore(spark, root, n_hashes=32, n_bands=8)
    # Re-open with matching params: fine. Mismatched banding must refuse
    # (band keys in the store would be meaningless to the new config).
    SignatureStore(spark, root, n_hashes=32, n_bands=8)
    import pytest

    with pytest.raises(AssertionError):
        SignatureStore(spark, root, n_hashes=16, n_bands=4)
