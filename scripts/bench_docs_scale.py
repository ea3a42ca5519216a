"""Amplified documents-corpus bench: the dedup/text family at >= 10^6
docs (round-4, closing VERDICT r3 "scale evidence for the docs family").

The CDC path has amplify=1024 evidence; this gives the text operators
the same treatment. The sf corpus is deterministically amplified
WITHOUT inflating the duplicate rate (each replica's text gets a
replica-unique salt — naive replication would make every base doc a
size-A duplicate cluster and the pair space quadratic); controlled
duplicates are PLANTED instead: within each base doc's replica block,
every PW-th replica pair is an exact copy and the next one a near copy,
so recall is checkable at scale against ground truth known by formula.

Reference analog: the streaming-not-materializing OOM lesson of the
aggregation cron (/root/reference/scripts/aggregate_items.py:42-77) —
band/gram explosion is THE failure mode these operators must bound at
real cardinalities.

Per (corpus size, op): wall seconds + result rows, plus for MinHash the
LSH band-bucket distribution (max/p99 bucket, candidate pairs
sum C(n,2)) and for winnowing/substring the stop-cap df distribution —
the quantities whose blowup would sink a 100 TB run.

Usage:
  python scripts/bench_docs_scale.py [--sf-dir /root/testdata/sf0.1]
      [--amplify 20,200] [--ops minhash,substring,winnowing,bm25]
      [--skip-recall]
Emits one JSON line per measurement and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_spark.operators import dedup  # noqa: E402
from data_pipeline_spark.session import get_spark, hermetic_session  # noqa: E402

PW = 100  # plant window: within each replica block, r%PW==1 copies r-1


def amplified_docs(spark, sf_dir: str, amplify: int):
    """doc_id' = doc_id*amplify + r, with texts that are genuinely
    DIFFERENT documents per replica: every word is remapped through a
    replica-indexed hash (w -> hex(xxhash64(w:r))[:8]), which preserves
    the corpus's word-count/structure statistics while driving
    cross-replica character-shingle Jaccard to ~0 — mere salting leaves
    every replica block a dense near-dup cluster and the pair space
    quadratic in amplify (measured: 3415 pairs for 500 planted at A=4).
    Organic base-corpus similarity survives only WITHIN one mapping
    index, so organic pairs scale linearly with A. Planted ground
    truth per block: r%pw==1 reuses mapping r-1 (exact dup of replica
    r-1); r%pw==2 reuses mapping r-2 plus one extra token (near dup of
    replica r-2)."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    par = spark.sparkContext.defaultParallelism
    base = base.repartition(4 * par)
    pw = min(PW, amplify)
    r_eff = (
        f"CASE WHEN r % {pw} = 1 THEN r - 1 "
        f"WHEN r % {pw} = 2 THEN r - 2 ELSE r END"
    )
    # POSITION-salted remap (w, i, r) -> hex8: the synthetic corpus has a
    # ~40-word vocabulary, so a position-free remap keeps ~160 inside-word
    # shingles shared corpus-wide per mapping index — minhash signatures
    # collapse onto them and band buckets grow to ~10^3 (measured:
    # max_bucket 1233, 7.6M candidate pairs, 469 s verify join at 10^5
    # docs). Real web corpora have long-tail vocabularies; salting by
    # position restores that diversity. Planted pairs are unaffected
    # (identical mapping index = identical positions).
    text = (
        "concat(array_join(transform(split(text, ' '), "
        f"(w, i) -> substr(hex(xxhash64(concat(w, ':', CAST(i AS STRING), "
        f"':', CAST({r_eff} AS STRING)))), 1, 8)"
        f"), ' '), CASE WHEN r % {pw} = 2 THEN ' zznear' ELSE '' END)"
    )
    return base.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))).alias("r"),
    ).select(
        (F.col("doc_id") * amplify + F.col("r")).alias("doc_id"),
        F.expr(text).alias("text"),
        F.col("r").alias("__r"),
    )


def check_recall(spark, docs, amplify: int, found_pairs) -> dict:
    """Every planted exact-dup pair must be found (identical docs share
    every MinHash band — LSH recall is 1.0 by construction, so a miss
    is a BUG, not tuning)."""
    pw = min(PW, amplify)
    planted = docs.filter((F.col("__r") % pw == 1)).select(
        (F.col("doc_id") - 1).alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    n_planted = planted.count()
    missing = planted.join(
        found_pairs.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti"
    ).count()
    return {"planted_exact_pairs": n_planted, "missing": missing}


def band_stats(spark) -> dict:
    """LSH band-bucket distribution over the registered ``documents``
    view, measured by the EXACT banding the production query uses
    (minhash_near_dup_sql stats_only mode)."""
    row = spark.sql(
        dedup.minhash_near_dup_sql(
            dedup.SPARK, "documents", fast=True, stats_only=True
        )
    ).first()
    return {k: (int(row[k]) if row[k] is not None else 0) for k in row.asDict()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--amplify", default="20,200")
    ap.add_argument("--ops", default="minhash,substring,winnowing,bm25")
    ap.add_argument("--skip-recall", action="store_true")
    args = ap.parse_args()
    ops = args.ops.split(",")
    spark = get_spark("bench_docs_scale")
    results = []
    for amplify in [int(a) for a in args.amplify.split(",")]:
        child = hermetic_session(spark)
        # 10^6-doc corpora need finer shuffle grain than the 2×cores
        # default: the shingle/band exchanges carry ~3×10^8 rows, and 32
        # concurrent hash-agg/join tasks over 64 partitions each hold
        # ~10 M rows of state — at an 8g local heap that OOMs (measured);
        # 8×cores partitions bound per-task state, AQE coalesces the
        # small side back.
        par = spark.sparkContext.defaultParallelism
        child.conf.set("spark.sql.shuffle.partitions", str(8 * par))
        docs = amplified_docs(child, args.sf_dir, amplify)

        def _reclaim():
            # Shuffle files live until the ContextCleaner GCs their RDDs;
            # three ~25 GB minhash-family passes back-to-back can exhaust
            # local disk before weak refs clear (measured: "No space left
            # on device" spill failures at the 10^6-doc level). A JVM GC
            # after each op lets the cleaner drop dereferenced shuffles.
            spark.sparkContext._jvm.System.gc()

        docs.persist()
        n_docs = docs.count()
        docs.drop("__r").createOrReplaceTempView("documents")

        if "minhash" in ops:
            t0 = time.time()
            pairs = child.sql(
                dedup.minhash_near_dup_sql(
                    dedup.SPARK, "documents", fast=True, min_ppm=500_000
                )
            )
            pairs.persist()
            n_pairs = pairs.count()
            wall = time.time() - t0
            rec = (
                {}
                if args.skip_recall
                else check_recall(child, docs, amplify, pairs)
            )
            bs = band_stats(child)
            row = {
                "op": "minhash_fast",
                "n_docs": n_docs,
                "wall_s": round(wall, 2),
                "pairs": n_pairs,
                **bs,
                **rec,
            }
            pairs.unpersist()
            _reclaim()
            results.append(row)
            print(json.dumps(row), flush=True)

        if "substring" in ops:
            from data_pipeline_spark.queries import SUBSTR_DEDUP_SPARK_SQL

            t0 = time.time()
            n = child.sql(SUBSTR_DEDUP_SPARK_SQL).count()
            _reclaim()
            row = {
                "op": "substring_dedup",
                "n_docs": n_docs,
                "wall_s": round(time.time() - t0, 2),
                "spans": n,
            }
            results.append(row)
            print(json.dumps(row), flush=True)

        if "winnowing" in ops:
            t0 = time.time()
            n = child.sql(
                dedup.winnowing_sql(dedup.SPARK, "documents")
            ).count()
            _reclaim()
            row = {
                "op": "winnowing",
                "n_docs": n_docs,
                "wall_s": round(time.time() - t0, 2),
                "pairs": n,
            }
            results.append(row)
            print(json.dumps(row), flush=True)

        if "bm25" in ops:
            from data_pipeline_spark.queries import _bm25_sql

            # the registry query's fixed terms don't exist in the
            # remapped corpus — rank against its own top-3 terms instead
            # (same plan shape; the oracle-pinned fixed-term form stays
            # in queries.py)
            q = _bm25_sql("spark").replace(
                "WHERE w IN ('merge', 'join', 'window')",
                "WHERE w IN (SELECT w FROM (SELECT w, count(*) AS c "
                "FROM tok WHERE w <> '' GROUP BY w "
                "ORDER BY c DESC, w LIMIT 3))",
            )
            t0 = time.time()
            n = child.sql(q).count()
            _reclaim()
            row = {
                "op": "bm25_topk",
                "n_docs": n_docs,
                "wall_s": round(time.time() - t0, 2),
                "rows": n,
            }
            results.append(row)
            print(json.dumps(row), flush=True)

        docs.unpersist()
    print(json.dumps({"summary": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
