"""Inverted text index: conjunctive search equals a direct token-set scan
through inserts, text rewrites (token moves), token-stable updates, and
deletes; refresh is cursor-idempotent; two incremental refreshes equal a
one-shot rebuild."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.operators.text_index import TextIndex, doc_tokens
from data_pipeline_spark.pipeline import ensure_table


def _batch(spark, rows):
    # rows: (url, lsn, text, op)
    df = spark.createDataFrame(rows, "url string, lsn bigint, text string, op string")
    return df.select(
        "url", "lsn",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
        "op",
    )


def _mk(spark, n_buckets=4):
    src = ensure_table(spark, tempfile.mkdtemp(prefix="tix_src_"), n_buckets)
    idx = TextIndex(spark, src, tempfile.mkdtemp(prefix="tix_idx_"), "text", n_buckets)
    return src, idx


def _expect(src, terms):
    """Direct scan: urls whose current text contains every term."""
    toks = sorted({t.lower() for t in terms})
    df = src.read().select("url", doc_tokens(F.col("text")).alias("__t"))
    cond = None
    for t in toks:
        c = F.array_contains("__t", t)
        cond = c if cond is None else (cond & c)
    return sorted(r.url for r in df.filter(cond).collect())


def _got(idx, terms):
    return sorted(r.src_key for r in idx.lookup_keys(terms).collect())


def test_index_tracks_insert_update_delete(spark):
    src, idx = _mk(spark)
    merge_into(src, _batch(spark, [
        ("u1", 1, "the quick brown fox", "insert"),
        ("u2", 2, "quick red fox jumps", "insert"),
        ("u3", 3, "slow brown bear", "insert"),
    ]), "m0")
    idx.refresh()
    assert _got(idx, ["quick", "fox"]) == ["u1", "u2"] == _expect(src, ["quick", "fox"])
    assert _got(idx, ["brown"]) == ["u1", "u3"]

    # rewrite u1: 'quick'/'fox' retract, 'lazy' asserts; delete u2
    merge_into(src, _batch(spark, [
        ("u1", 10, "the lazy brown dog", "update"),
        ("u2", 11, None, "delete"),
    ]), "m1")
    idx.refresh()
    assert _got(idx, ["quick"]) == [] == _expect(src, ["quick"])
    assert _got(idx, ["lazy", "brown"]) == ["u1"]
    assert _got(idx, ["fox"]) == []


def test_token_stable_update_survives_equal_fence(spark):
    """An update whose token SET is unchanged nets (retract, assert) on
    the same index key in one epoch — the assert must win (posting still
    live), the equal-lsn tie the round-2 ADVICE flagged on SecondaryIndex."""
    src, idx = _mk(spark)
    merge_into(src, _batch(spark, [("u1", 1, "alpha beta", "insert")]), "m0")
    idx.refresh()
    # text changes but tokens {alpha, beta} identical (case + punctuation)
    merge_into(src, _batch(spark, [("u1", 5, "Alpha, BETA!", "update")]), "m1")
    idx.refresh()
    assert _got(idx, ["alpha", "beta"]) == ["u1"] == _expect(src, ["alpha", "beta"])


def test_incremental_equals_one_shot_rebuild(spark):
    src, idx = _mk(spark)
    merge_into(src, _batch(spark, [
        ("u1", 1, "one two three", "insert"),
        ("u2", 2, "two three four", "insert"),
    ]), "m0")
    idx.refresh()
    merge_into(src, _batch(spark, [
        ("u1", 9, "five six", "update"),
        ("u3", 8, "three five", "insert"),
    ]), "m1")
    idx.refresh()

    fresh = TextIndex(
        spark, src, tempfile.mkdtemp(prefix="tix_fresh_"), "text", 4
    )
    fresh.refresh()

    def postings(ix):
        return sorted(
            (r.tok, r.src_key)
            for r in ix.table.read(columns=["tok", "src_key"]).collect()
        )

    assert postings(idx) == postings(fresh)
    # refresh with no new source commits is a no-op at the same cursor
    c = idx.cursor
    assert idx.refresh() == c


def test_search_routes_and_matches_scan(spark):
    src, idx = _mk(spark)
    merge_into(src, _batch(spark, [
        (f"u{i}", i + 1, f"common term{'x' if i % 2 else ''} doc{i}", "insert")
        for i in range(8)
    ]), "m0")
    idx.refresh()
    idx.optimize("opt-1")
    # selective conjunction → point-lookup path
    got = sorted(r.url for r in idx.search(["common", "doc3"]).collect())
    assert got == ["u3"]
    # low-selectivity with max_point_keys=1 → semi-join scan path
    got = sorted(r.url for r in idx.search(["common"], max_point_keys=1).collect())
    assert got == [f"u{i}" for i in range(8)]
    # zero matches → empty frame with source schema
    assert idx.search(["absent"]).count() == 0
