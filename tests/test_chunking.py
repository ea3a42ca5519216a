"""docs_chunk_windows invariants beyond oracle parity: full coverage,
stride/overlap geometry, and short-doc behavior."""

from pyspark.sql import functions as F

from data_pipeline_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"
W, S = 24, 16


def test_chunks_tile_every_token(spark):
    out = REGISTRY["docs_chunk_windows"].spark(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    g = (
        out.groupBy("doc_id")
        .agg(
            F.count("*").alias("k"),
            F.max("chunk_idx").alias("last"),
            F.min("chunk_tokens").alias("min_tok"),
            F.max("chunk_tokens").alias("max_tok"),
        )
        .join(docs, "doc_id")
    )
    rows = g.collect()
    assert rows
    for r in rows:
        # contiguous chunk indexes 0..k-1
        assert r.last == r.k - 1
        # last chunk reaches the end of the doc: (k-1)*S + W >= n
        assert (r.k - 1) * S + W >= r.n
        # no chunk exceeds the window; every chunk is non-empty
        assert 1 <= r.min_tok and r.max_tok <= W
        # short docs yield exactly one chunk of n tokens
        if r.n <= W:
            assert r.k == 1 and r.max_tok == r.n


def test_chunk_hashes_reproduce_python_slicing(spark):
    out = {
        (r.doc_id, r.chunk_idx): r.chunk_md5
        for r in REGISTRY["docs_chunk_windows"].spark(spark, SF_DIR).collect()
    }
    import hashlib

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20).collect()
    for d in docs:
        toks = d.text.split(" ")
        n = len(toks)
        k = 1 if n <= W else (n - W + S - 1) // S + 1
        for i in range(k):
            chunk = " ".join(toks[i * S: i * S + W])
            assert out[(d.doc_id, i)] == hashlib.md5(chunk.encode()).hexdigest()
