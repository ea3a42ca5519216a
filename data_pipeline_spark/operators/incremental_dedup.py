"""Incremental near-duplicate detection against a persisted signature store.

The batch MinHash+LSH plan (operators/dedup.py) re-shingles the WHOLE
corpus per run — fine for a one-shot sweep, quadratic waste for a live
ingest where each day adds 0.1% of the corpus. The production shape
(what a crawl pipeline actually runs) is INCREMENTAL: MinHash band keys
for every accepted document persist in a lake table, and a new batch

  1. computes its own signatures (one shingle→min aggregate over the
     batch only),
  2. band-joins them against the STORE (new×old) and itself (new×new) —
     the store side is a narrow (doc_id, n, b0..b{B-1}) scan, never the
     corpus text,
  3. verifies candidates by exact Jaccard, re-shingling ONLY the
     candidate documents (a semi-joined sliver of the corpus),
  4. appends the batch's signatures to the store through the engine's
     idempotent commit path (a redelivered batch re-emits the same
     decisions and no-ops the store append).

Decisions are hash-family-independent exactly as in the batch plan: LSH
only GENERATES candidates, the exact-Jaccard threshold DECIDES, so the
fast xxhash64 production spelling carries the md5-mode DuckDB oracle on
the emitted pair set (see dedup.minhash_near_dup_sql docstring for the
recall bound). Union of every batch's pairs == the batch plan's pairs
filtered to doc_b in the ingested range — the driver entry
``docs_incremental_dedup`` pins that equality corpus-wide.

Reference analog: the watch loop's dedup-by-key before re-processing
(reference: scripts/watch_cdse_and_process.py:95-146) lifted from exact
id-equality to near-duplicate content equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.operators import dedup as dd


def signature_sql(
    rel: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_k: int = 5,
    fast: bool = True,
    dialect: str = dd.SPARK,
) -> str:
    """One-pass signature projection: ``doc_id, n, b0..b{n_bands-1}`` —
    the same shingle/min-hash/band-key expressions as the batch plan
    (dedup.minhash_near_dup_sql), factored so the store and the batch
    sweep can never drift."""
    r = n_hashes // n_bands
    salted = ["concat('" + str(j) + ":', sh)" for j in range(n_hashes)]
    mins = ", ".join(
        f"min({dd.h60(salted[j], dialect, fast)}) AS m{j}"
        for j in range(n_hashes)
    )

    def band_key(b: int) -> str:
        packed = "concat_ws(',', " + ", ".join(
            f"m{b * r + i}" for i in range(r)
        ) + ")"
        return dd.h60(packed, dialect, fast)

    bands = ", ".join(f"{band_key(b)} AS b{b}" for b in range(n_bands))
    return f"""
        WITH sh AS (
          SELECT doc_id,
                 {dd._unnest(dd.shingles('text', shingle_k, dialect), 'sh', dialect)}
          FROM {rel}
        ),
        sig AS (SELECT doc_id, count(*) AS n, {mins} FROM sh GROUP BY doc_id)
        SELECT CAST(doc_id AS STRING) AS doc_id, n, {bands} FROM sig
    """


class SignatureStore:
    """MinHash band-key store as a lake table: key = doc_id, one narrow
    row per accepted document. Rides the whole engine for free —
    idempotent commits, merge-on-read deltas, compaction, time travel."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_hashes: int = 32,
        n_bands: int = 8,
        shingle_k: int = 5,
        n_buckets: int = 8,
    ):
        self.spark = spark
        self.n_hashes, self.n_bands, self.k = n_hashes, n_bands, shingle_k
        if LakeTable.exists(root):
            self.table = LakeTable(spark, root)
            p = self.table.current().props
            assert int(p["dedup.n_hashes"]) == n_hashes
            assert int(p["dedup.n_bands"]) == n_bands
        else:
            schema = [
                ("doc_id", "string"),
                ("lsn", "bigint"),
                ("n", "bigint"),
            ] + [(f"b{b}", "bigint") for b in range(n_bands)]
            self.table = LakeTable.create(
                spark, root, schema, key="doc_id", n_buckets=n_buckets,
                props={
                    "dedup.n_hashes": n_hashes,
                    "dedup.n_bands": n_bands,
                    "dedup.shingle_k": shingle_k,
                },
            )

    def signatures(self, docs: DataFrame, fast: bool = True) -> DataFrame:
        # Unique per-call view name, dropped after the (eager) analysis
        # of the returned DataFrame inlines it — concurrent batches on
        # one session never cross, and no namespace residue is left.
        import uuid

        view = f"__inc_dedup_batch_{uuid.uuid4().hex[:12]}"
        docs.createOrReplaceTempView(view)
        try:
            return self.spark.sql(
                signature_sql(view, self.n_hashes, self.n_bands, self.k, fast)
            )
        finally:
            self.spark.catalog.dropTempView(view)

    def _bands_long(self, sigs: DataFrame) -> DataFrame:
        """(doc_id, n, band, bh) long form via one stack (no shuffle)."""
        stack = ", ".join(f"{b}, b{b}" for b in range(self.n_bands))
        return sigs.selectExpr(
            "doc_id", "n", f"stack({self.n_bands}, {stack}) AS (band, bh)"
        )

    def process_batch(
        self,
        docs: DataFrame,
        corpus: DataFrame,
        commit_key: str,
        min_ppm: int = 500_000,
        fast: bool = True,
    ) -> DataFrame:
        """Near-dup pairs (doc_a, doc_b, inter, n_a, n_b, jacc_ppm) with
        ``doc_b`` in this batch and ``doc_a`` earlier (store) or in-batch
        with a smaller id, exact-Jaccard ≥ ``min_ppm``; then append the
        batch's signatures to the store (idempotent on ``commit_key``).

        ``corpus`` must resolve the TEXT of every candidate id (store
        docs included) — in a full pipeline this is the documents lake
        table; verification semi-joins it down to candidates only.
        """
        sigs = self.signatures(docs, fast=fast).cache()
        new_b = self._bands_long(sigs)
        old_b = self._bands_long(self.table.read())
        # new×old: every stored id predates the batch by construction.
        cand_cross = old_b.alias("a").join(
            new_b.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            # Guard against redelivery overlap: a doc already in the
            # store must not pair with itself.
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        # new×new, classic a < b orientation (numeric id order).
        cand_self = new_b.alias("a").join(
            new_b.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (
                F.col("a.doc_id").cast("bigint")
                < F.col("b.doc_id").cast("bigint")
            ),
        )
        proj = [
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.n").alias("n_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.n").alias("n_b"),
        ]
        cand = (
            cand_cross.select(*proj)
            .unionByName(cand_self.select(*proj))
            .distinct()
        )
        # Verify by exact Jaccard over the candidate sliver of the corpus.
        ids = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sliver = corpus.withColumn(
            "doc_id", F.col("doc_id").cast("string")
        ).join(ids, "doc_id", "left_semi")
        sh = sliver.selectExpr(
            "doc_id",
            f"explode({dd.shingles('text', self.k, dd.SPARK)}) AS sh",
        )
        inter = (
            cand.join(sh.alias("s1"), F.col("doc_a") == F.col("s1.doc_id"))
            .join(
                sh.alias("s2"),
                (F.col("doc_b") == F.col("s2.doc_id"))
                & (F.col("s1.sh") == F.col("s2.sh")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(
                F.max("n_a").alias("n_a"),
                F.max("n_b").alias("n_b"),
                F.count("*").alias("inter"),
            )
        )
        pairs = inter.withColumn(
            "jacc_ppm",
            F.round(
                F.lit(1e6)
                * F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ).cast("bigint"),
        ).filter(F.col("jacc_ppm") >= min_ppm)

        rows = sigs.withColumn(
            "lsn", F.col("doc_id").cast("bigint")
        ).withColumn("op", F.lit("insert"))
        merge_into(self.table, rows, commit_key, precollapsed=True)
        return pairs.select("doc_a", "doc_b", "inter", "n_a", "n_b", "jacc_ppm")
