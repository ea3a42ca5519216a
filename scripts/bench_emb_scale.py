"""Amplified embeddings bench: the ANN / k-means family at >= 10^6
vectors (round-5, closing VERDICT r4 "next round" #5 — the one operator
family without scale evidence).

Deterministic corpus amplification with PLANTED near-neighbors whose
ground truth is known by formula: vec_id' = vec_id·A + r, where replica
r carries integer jitter of ±125 quantized units per coordinate (same
order as the signal — replicas are genuinely different vectors, so the
neighbor structure does not collapse into size-A duplicate clusters),
EXCEPT r % PW == 1, which copies replica r-1's exact vector plus +1 on
coordinate 0 — squared-L2 distance 1, the unambiguous nearest neighbor
of its partner at any corpus size.

Measured per corpus size (default 10^5 and 10^6):

* brute-force exact top-k wall (the baseline the engine must beat) and
  planted-neighbor recall (MUST be 1.0 — distance-1 pairs that escape
  an exact scan indicate a broken fixture, not a broken index);
* k-means codebook training wall (`kmeans_train`, the looped-DataFrame
  Lloyd's production form);
* IVF serve wall + recall@k vs the brute-force ground truth at two
  probe depths (the recall/probe trade the 100 TB design hinges on);
* sign-LSH bucket distribution (max / p99 / mean bucket size) — the
  quantity whose blowup sinks a bucketed join at scale.

Ranking metric is exact integer squared-L2 (`int_l2`) end-to-end:
BIGINT arithmetic, engine-exact, and proximity-faithful for the planted
fixture (integer DOT ranking would let same-base jitter replicas beat a
distance-1 partner on norm noise — measured during fixture design).

Usage:
  python scripts/bench_emb_scale.py [--sf-dir /root/testdata/sf0.1]
      [--amplify 50,500] [--n-queries 16] [--k 10]
Emits one JSON line per measurement and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from data_pipeline_spark.operators import similarity as sim  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402

PW = 100  # plant window: replica r % PW == 1 is a distance-1 copy of r-1
DIM = sim.DIM


def amplified(spark, sf_dir: str, amplify: int) -> DataFrame:
    """vec_id' = vec_id·A + r with per-replica integer jitter and the
    distance-1 plant described in the module docstring. Pure SQL
    (xxhash64 + transform) — no Python in the synthesis."""
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.expr(sim.quantize("embedding", sim.SPARK)).alias("qe0")
    )
    reps = spark.range(amplify).withColumnRenamed("id", "r")
    return (
        base.crossJoin(reps)
        .select(
            (F.col("vec_id") * amplify + F.col("r")).alias("vec_id"),
            F.expr(
                f"""
                transform(qe0, (x, i) ->
                  x
                  + CASE WHEN r - (CASE WHEN r % {PW} = 1 THEN 1 ELSE 0 END) = 0
                         THEN CAST(0 AS BIGINT)
                         ELSE xxhash64(vec_id,
                                r - (CASE WHEN r % {PW} = 1 THEN 1 ELSE 0 END),
                                i) % 126 END
                  + CASE WHEN r % {PW} = 1 AND i = 0
                         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
                """
            ).alias("qe"),
        )
    )


def _l2(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def brute_topk(spark, rel: str, query_ids: list[int], k: int) -> DataFrame:
    """Exact top-k by squared L2: broadcast the tiny query set, scan the
    corpus once (embarrassingly parallel), tiny final per-query top-k."""
    ids = ", ".join(str(i) for i in query_ids)
    return spark.sql(
        f"""
        SELECT query_id, neighbor_id, d FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {_l2('q.qe', 'c.qe')} AS d,
                 row_number() OVER (PARTITION BY q.vec_id
                                    ORDER BY {_l2('q.qe', 'c.qe')},
                                             c.vec_id) AS rn
          FROM (SELECT * FROM {rel} WHERE vec_id IN ({ids})) q
          JOIN {rel} c ON c.vec_id <> q.vec_id
        ) WHERE rn <= {k}
        """
    )


def ivf_topk(
    spark, rel: str, cents: list[list[int]], query_ids: list[int],
    k: int, n_probe: int,
) -> DataFrame:
    """IVF serve from a TRAINED codebook: broadcast assignment of the
    corpus to its L2-nearest centroid (codebook is k·dim ints — a
    literal), probe the n_probe closest cells per query, exact rank
    inside the probed sliver. No full scan per query."""
    structs = ", ".join(
        "struct(" + _l2(
            "qe",
            "array(" + ",".join(f"CAST({v} AS BIGINT)" for v in c) + ")",
        ) + f" AS d, {cid} AS cid)"
        for cid, c in enumerate(cents)
    )
    ids = ", ".join(str(i) for i in query_ids)
    return spark.sql(
        f"""
        WITH assigned AS (
          SELECT vec_id, qe, array_min(array({structs})).cid AS cid
          FROM {rel}
        ),
        probes AS (
          SELECT vec_id AS query_id, qe, pr.cid AS cid
          FROM (
            SELECT vec_id, qe,
                   explode(slice(array_sort(array({structs})),
                                 1, {n_probe})) AS pr
            FROM {rel} WHERE vec_id IN ({ids})
          )
        )
        SELECT query_id, neighbor_id, d FROM (
          SELECT p.query_id, n.vec_id AS neighbor_id,
                 {_l2('p.qe', 'n.qe')} AS d,
                 row_number() OVER (PARTITION BY p.query_id
                                    ORDER BY {_l2('p.qe', 'n.qe')},
                                             n.vec_id) AS rn
          FROM probes p JOIN assigned n
            ON n.cid = p.cid AND n.vec_id <> p.query_id
        ) WHERE rn <= {k}
        """
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--amplify", default="50,500")
    ap.add_argument("--n-queries", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--kmeans-k", type=int, default=16)
    ap.add_argument("--kmeans-iters", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("emb_scale")
    summary = []
    for A in [int(a) for a in args.amplify.split(",")]:
        root = tempfile.mkdtemp(prefix=f"emb_scale_{A}_")
        try:
            # untimed prep: land the amplified corpus as parquet so every
            # op pays a real scan (and the synthesis is paid once)
            amplified(spark, args.sf_dir, A).repartition(64).write.parquet(
                os.path.join(root, "corpus")
            )
            corpus = spark.read.parquet(os.path.join(root, "corpus"))
            corpus.createOrReplaceTempView("corpus")
            n = corpus.count()
            # queries: the planted replicas r=1 of the first n_q base ids
            qids = [b * A + 1 for b in range(args.n_queries)]
            partners = {b * A + 1: b * A for b in range(args.n_queries)}

            t0 = time.monotonic()
            bf = brute_topk(spark, "corpus", qids, args.k).collect()
            t_bf = time.monotonic() - t0
            bf_top: dict[int, list[int]] = {}
            for r in sorted(bf, key=lambda r: (r.query_id, r.d, r.neighbor_id)):
                bf_top.setdefault(r.query_id, []).append(r.neighbor_id)
            planted_recall = sum(
                1 for q in qids if bf_top.get(q, [None])[0] == partners[q]
            ) / len(qids)

            t0 = time.monotonic()
            emb = corpus.select(
                "vec_id",
                F.expr("transform(qe, x -> CAST(x AS DOUBLE) / 1000.0)")
                .alias("embedding"),
            )
            cents = sim.kmeans_train(
                emb, k=args.kmeans_k, iters=args.kmeans_iters
            )
            t_train = time.monotonic() - t0

            ivf = {}
            for n_probe in (1, 4):
                t0 = time.monotonic()
                rows = ivf_topk(
                    spark, "corpus", cents, qids, args.k, n_probe
                ).collect()
                t_ivf = time.monotonic() - t0
                got: dict[int, set] = {}
                for r in rows:
                    got.setdefault(r.query_id, set()).add(r.neighbor_id)
                recall = sum(
                    len(got.get(q, set()) & set(bf_top.get(q, [])))
                    / max(len(bf_top.get(q, [])), 1)
                    for q in qids
                ) / len(qids)
                ivf[f"probe{n_probe}"] = {
                    "wall_s": round(t_ivf, 2),
                    "recall_at_k": round(recall, 4),
                }

            planes = sim.hyperplanes(8)
            t0 = time.monotonic()
            buckets = spark.sql(
                f"SELECT {sim.lsh_bucket('qe', planes, sim.SPARK)} AS b, "
                "count(*) AS n FROM corpus GROUP BY 1"
            ).collect()
            t_lsh = time.monotonic() - t0
            sizes = sorted((r.n for r in buckets), reverse=True)
            p99 = sizes[max(0, int(len(sizes) * 0.01) - 1)] if sizes else 0

            rec = {
                "vectors": n,
                "amplify": A,
                "brute_force": {
                    "wall_s": round(t_bf, 2),
                    "planted_recall_top1": planted_recall,
                },
                "kmeans_train": {
                    "wall_s": round(t_train, 2),
                    "k": args.kmeans_k,
                    "iters": args.kmeans_iters,
                },
                "ivf": ivf,
                "lsh_buckets": {
                    "wall_s": round(t_lsh, 2),
                    "n_buckets": len(sizes),
                    "max": sizes[0] if sizes else 0,
                    "p99": p99,
                    "mean": round(n / len(sizes), 1) if sizes else 0,
                },
            }
            print(json.dumps(rec), flush=True)
            summary.append(rec)
        finally:
            shutil.rmtree(root, ignore_errors=True)
            spark.catalog.clearCache()
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
