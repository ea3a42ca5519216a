"""Near-duplicate detection for training-data curation: MinHash+LSH,
SimHash, n-gram Jaccard — plus the exact hash-groupBy dedup in queries.py.

These are the web-corpus analogs of the reference's layered dedup
(existence dedup by derived key, scripts/trigger_cdse.py:104-121; event-time
dedup vs accumulated state, scripts/ingest_v1_s1_rtc.py:110-127) scaled to
content similarity instead of exact keys.

Design for 100 TB:

* Everything is declarative Spark SQL over exploded shingle/band rows — no
  Python in the hot path; whole-stage codegen applies end to end.
* MinHash+LSH: the O(n²) pair space is cut to same-LSH-band candidates; the
  band join is an equi-join on (band, band_hash) that AQE can split on skew
  (a boilerplate shingle flooding one band is the hot-key case).
* Candidate verification joins back to the inverted shingle index (shuffle
  on shingle) — the standard two-stage sketch→verify shape.
* Hash function is pluggable: ``fast=True`` uses JVM xxhash64 (production);
  the default md5-60bit spelling is reproducible in DuckDB so every operator
  here has an exact cross-engine oracle. Same algorithm, different hash.

Jaccard values are emitted as ``jacc_ppm`` (parts-per-million, BIGINT):
both engines compute round(1e6 * inter / union) over exact integers with
identical IEEE order, so the driver's value-hash comparison is stable.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"


# -- dialect fragments -------------------------------------------------------

def h60(expr: str, dialect: str, fast: bool = False) -> str:
    """Deterministic 60-bit hash of a string expression.

    md5-based (cross-engine) by default; xxhash64 (JVM, ~10× cheaper) when
    ``fast`` — production plans flip fast=True, oracles cannot."""
    if fast and dialect == SPARK:
        return f"xxhash64({expr})"
    if dialect == SPARK:
        return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def shingles(text: str, k: int, dialect: str) -> str:
    """Distinct character k-shingles of ``text`` as an array expression."""
    if dialect == SPARK:
        return (
            f"array_distinct(transform("
            f"sequence(1, greatest(length({text}) - {k} + 1, 1)), "
            f"i -> substring({text}, i, {k})))"
        )
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({text}) - {k} + 1, 1) + 1), "
        f"i -> substr({text}, CAST(i AS INT), {k})))"
    )


def _unnest(arr: str, alias: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"explode({arr}) AS {alias}"
    return f"unnest({arr}) AS {alias}"


def _bigint(expr: str, dialect: str) -> str:
    return f"CAST({expr} AS BIGINT)" if dialect == DUCK else expr


# -- MinHash + LSH -----------------------------------------------------------

def minhash_near_dup_sql(
    dialect: str,
    docs_rel: str = "documents",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_k: int = 5,
    fast: bool = False,
    min_ppm: int = 0,
    stats_only: bool = False,
) -> str:
    """Verified near-duplicate pairs via MinHash signatures + LSH banding.

    ``stats_only=True`` returns the LSH band-BUCKET distribution
    (n_buckets/max/p99 bucket size, candidate pairs = Σ C(n,2)) over the
    SAME sh/sig/bands CTEs instead of the pair output — the quantity
    whose blowup floods the candidate join at 10^6+ docs, measured by
    the exact banding the production query uses (bench_docs_scale.py).

    Plan shape: shingle explode → n_hashes-way min aggregate (map-side
    combine) → band explode → self equi-join on (band, band_hash) →
    inverted-index verify join → exact Jaccard. One SQL text per dialect;
    the two texts differ only in dialect spelling.

    ``min_ppm`` thresholds the OUTPUT on exact Jaccard. With a threshold,
    the emitted pair set becomes (near-)independent of the hash family:
    LSH only generates candidates, exact Jaccard decides, and banding
    recall at the threshold bounds the family-dependence (e.g. 32 hashes /
    8 bands / r=4 at j ≥ 0.5 misses a qualifying pair with probability
    (1-j^4)^8 ≤ 2e-5 at the observed corpus minimum j≈0.93) — this is what
    lets the fast (xxhash64) production spelling carry an exact md5-based
    cross-engine oracle on the pair DECISIONS (see
    tests/test_dedup_modes.py for the decision-equality pin).
    """
    r = n_hashes // n_bands
    salted = ["concat('" + str(j) + ":', sh)" for j in range(n_hashes)]
    # ONE aggregate pass computes the shingle-set size AND every min-hash
    # (Spark inlines CTEs, so a `sizes` twin or UNION-ALL band selects
    # would recompute this whole pass per reference).
    mins = ", ".join(
        f"min({h60(salted[j], dialect, fast)}) AS m{j}" for j in range(n_hashes)
    )

    # Band keys are BIGINTs (not md5 strings): the candidate self-join
    # shuffles 8-byte keys instead of 32-char strings; a 60-bit truncation
    # collision only adds a false candidate, which the exact-Jaccard
    # verify join discards. Bands are emitted by ONE explode over the sig
    # row (not n_bands UNION ALL branches), and the set size rides along
    # so no later join back to sig is needed.
    def _band_key(b: int) -> str:
        packed = "concat_ws(',', " + ", ".join(
            f"m{b * r + i}" for i in range(r)
        ) + ")"
        return h60(packed, dialect, fast)

    if dialect == SPARK:
        band_arr = "array(" + ", ".join(
            f"named_struct('band', {b}, 'bh', {_band_key(b)})"
            for b in range(n_bands)
        ) + ")"
        bands = (
            "SELECT doc_id, n, x.band AS band, x.bh AS bh FROM ("
            f"SELECT doc_id, n, explode({band_arr}) AS x FROM sig)"
        )
    else:
        band_arr = "[" + ", ".join(
            "{'band': %d, 'bh': %s}" % (b, _band_key(b))
            for b in range(n_bands)
        ) + "]"
        bands = (
            "SELECT doc_id, n, x.band AS band, x.bh AS bh FROM ("
            f"SELECT doc_id, n, unnest({band_arr}) AS x FROM sig)"
        )

    if stats_only:
        p99 = (
            "CAST(percentile_approx(n, 0.99) AS BIGINT)"
            if dialect == SPARK
            else "CAST(quantile_disc(n, 0.99) AS BIGINT)"
        )
        return f"""
        WITH sh AS (
          SELECT doc_id, {_unnest(shingles('text', shingle_k, dialect), 'sh', dialect)}
          FROM {docs_rel}
        ),
        sig AS (SELECT doc_id, count(*) AS n, {mins} FROM sh GROUP BY doc_id),
        bands AS ({bands}),
        buckets AS (
          SELECT band, bh, count(*) AS n FROM bands GROUP BY band, bh
        )
        SELECT CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(max(n) AS BIGINT) AS max_bucket,
               {p99} AS p99_bucket,
               CAST(sum(n * (n - 1) / 2) AS BIGINT) AS candidate_pairs
        FROM buckets WHERE n >= 2
    """
    return f"""
        WITH sh AS (
          SELECT doc_id, {_unnest(shingles('text', shingle_k, dialect), 'sh', dialect)}
          FROM {docs_rel}
        ),
        sig AS (SELECT doc_id, count(*) AS n, {mins} FROM sh GROUP BY doc_id),
        bands AS ({bands}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, a.n AS n_a,
                          b.doc_id AS doc_b, b.n AS n_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        ),
        verified AS (
          SELECT c.doc_a, c.doc_b, max(c.n_a) AS n_a, max(c.n_b) AS n_b,
                 count(*) AS inter
          FROM cand c
          JOIN sh s1 ON s1.doc_id = c.doc_a
          JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.sh = s1.sh
          GROUP BY c.doc_a, c.doc_b
        )
        SELECT doc_a, doc_b,
               {_bigint('inter', dialect)} AS inter,
               {_bigint('n_a', dialect)} AS n_a,
               {_bigint('n_b', dialect)} AS n_b,
               CAST(round(1e6 * inter / (n_a + n_b - inter)) AS BIGINT)
                 AS jacc_ppm
        FROM verified
        WHERE round(1e6 * inter / (n_a + n_b - inter)) >= {min_ppm}
    """


# -- transitive dedup clusters (connected components) -------------------------

def connected_components_star(pairs, a: str = "doc_a", b: str = "doc_b",
                              max_iter: int = 30):
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):

    * large-star(u): hook every neighbor v > u onto m = min(Γ(u) ∪ {u})
    * small-star(u): hook every smaller neighbor (and u itself) onto the
      minimum of u's smaller neighborhood

    Each round is two groupBy+join passes over the edge set; convergence is
    O(log² n) rounds REGARDLESS of component diameter — the scale-safe
    choice for adversarial graphs (long chains), where min-label
    propagation needs O(diameter) shuffles. For shallow near-dup clusters
    the simpler label propagation (``connected_components``) wins on
    constant factors; both return identical (doc_id, cluster_id) labels
    (property-pinned against each other and a union-find reference in
    tests/test_cc_algorithms.py).

    The stability probe compares edge sets exactly (two anti-join
    ``limit(1)`` jobs — no checksum false convergence); per-round data
    never leaves the cluster."""
    from pyspark.sql import functions as F

    nodes = (
        pairs.selectExpr(f"{a} AS doc_id")
        .unionByName(pairs.selectExpr(f"{b} AS doc_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Canonical directed representation: u → v with v < u.
    edges = (
        pairs.selectExpr(
            f"CASE WHEN {a} > {b} THEN {a} ELSE {b} END AS u",
            f"CASE WHEN {a} > {b} THEN {b} ELSE {a} END AS v",
        )
        .filter("u <> v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # large-star over the symmetric view
        sym = edges.unionByName(
            edges.selectExpr("v AS u", "u AS v")
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter("u <> v")
            .distinct()
        )
        # small-star over the to-smaller orientation of ls
        dir_ = ls.selectExpr(
            "CASE WHEN u > v THEN u ELSE v END AS u",
            "CASE WHEN u > v THEN v ELSE u END AS v",
        ).distinct()
        mins2 = dir_.groupBy("u").agg(F.min("v").alias("m"))
        new = (
            dir_.join(mins2, "u")
            .selectExpr("v AS w", "m")
            .unionByName(mins2.selectExpr("u AS w", "m"))
            .filter("w <> m")
            .selectExpr("w AS u", "m AS v")
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            new.exceptAll(edges).limit(1).count()
            + edges.exceptAll(new).limit(1).count()
        )
        edges = new
        if changed == 0:
            break
    return nodes.join(
        edges.selectExpr("u AS doc_id", "v AS root"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("root", "doc_id").alias("cluster_id")
    )


def connected_components(pairs, a: str = "doc_a", b: str = "doc_b",
                         max_iter: int = 25):
    """Connected components over near-dup pairs via iterative min-label
    propagation: every node starts labelled with itself; each round a node
    adopts the minimum label among itself and its neighbors; fixpoint in
    O(component diameter) rounds. Returns (doc_id, cluster_id) with
    cluster_id = the component's minimum doc_id.

    This closes the transitivity gap of greedy pair-dropping (A~B, B~C ⇒
    one survivor for {A,B,C} even when A~C misses the threshold) — the
    reference collapses GROUPS, not pairs (trigger_cdse.py:123-141).

    Scale shape: each round is one shuffle (join on doc_id) + one
    aggregate; ``localCheckpoint`` truncates the lineage so plans stay
    O(1) per round. Near-dup components are shallow (dup clusters, not
    social graphs), so rounds ≈ 2-4; the driver-side loop is control flow
    only — per-round data never leaves the cluster (the convergence probe
    is a 1-row count). For adversarial diameters switch to the
    large-star/small-star algorithm (same primitive ops).
    """
    from pyspark.sql import functions as F

    edges = (
        pairs.selectExpr(f"{a} AS src", f"{b} AS dst")
        .unionByName(pairs.selectExpr(f"{b} AS src", f"{a} AS dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new = (
            labels.join(neigh, labels.doc_id == neigh.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def clusters_duckdb_sql(
    pairs_sql: str, survivors: bool = False, docs_rel: str = "documents"
) -> str:
    """DuckDB oracle: transitive closure over the pair graph via a
    recursive CTE; cluster_id = min(reachable ∪ self). With ``survivors``
    the outer query instead emits every document that is its cluster's
    representative (or in no cluster) — the corpus a training pipeline
    keeps after transitive dedup."""
    cte = f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION
          SELECT doc_b, doc_a FROM pairs
        ),
        walk(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT w.src, e.dst FROM walk w JOIN edges e ON e.src = w.dst
        ),
        clusters AS (
          SELECT src AS doc_id, min(dst) AS cluster_id FROM (
            SELECT src, dst FROM walk
            UNION SELECT src, src FROM edges
          ) GROUP BY src
        )
    """
    if not survivors:
        return cte + " SELECT doc_id, cluster_id FROM clusters"
    return cte + f"""
        SELECT d.doc_id, d.lang, d.source FROM {docs_rel} d
        WHERE NOT EXISTS (
          SELECT 1 FROM clusters c
          WHERE c.doc_id = d.doc_id AND c.doc_id <> c.cluster_id)
    """


# -- SimHash -----------------------------------------------------------------

def simhash_sql(
    dialect: str,
    docs_rel: str = "documents",
    bits: int = 32,
    fast: bool = False,
) -> str:
    """Per-document ``bits``-bit SimHash over lowercase word tokens.

    Bit b of the fingerprint is the sign of sum over tokens of ±1 depending
    on bit b of the token hash — expressed as ``bits`` conditional-sum
    aggregates in ONE groupBy (map-side partial aggregation; no UDF).
    """
    tok = (
        "explode(filter(split(lower(text), '\\\\s+'), t -> t <> '')) AS tok"
        if dialect == SPARK
        else "unnest(list_filter(string_split_regex(lower(text), '\\s+'), "
        "t -> t <> '')) AS tok"
    )
    h = h60("tok", dialect, fast)
    sums = ", ".join(
        f"sum(CASE WHEN (({h} >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    combine = " + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(bits)
    )
    return f"""
        WITH toks AS (SELECT doc_id, {tok} FROM {docs_rel}),
        bitsums AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id)
        SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM bitsums
    """


def simhash_near_dup_sql(
    dialect: str,
    docs_rel: str = "documents",
    bits: int = 32,
    max_hamming: int = 3,
    fast: bool = False,
) -> str:
    """Near-dup pairs with Hamming(simhash) ≤ ``max_hamming``.

    Banding by 8-bit chunks: with 4 chunks and distance ≤ 3, pigeonhole
    guarantees at least one identical chunk, so candidates are an equi-join
    on (chunk_idx, chunk_val) — never the O(n²) cross product.
    """
    n_chunks = bits // 8
    assert n_chunks > max_hamming, "banding guarantee needs chunks > distance"
    chunk_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {c} AS chunk, ((simhash >> {8 * c}) & 255) AS cv "
        f"FROM sig"
        for c in range(n_chunks)
    )
    return f"""
        WITH sig AS ({simhash_sql(dialect, docs_rel, bits, fast)}),
        chunks AS ({chunk_rows}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, a.simhash, b.doc_id AS doc_b,
                 b.simhash AS simhash_b
          FROM chunks a JOIN chunks b
            ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, CAST(bit_count({
            "a.simhash ^ simhash_b" if dialect == SPARK else "xor(a.simhash, simhash_b)"
        }) AS INT) AS hamming
        FROM cand a
        WHERE bit_count({
            "a.simhash ^ simhash_b" if dialect == SPARK else "xor(a.simhash, simhash_b)"
        }) <= {max_hamming}
    """


# -- n-gram Jaccard (inverted index, no sketch) ------------------------------

def ngram_jaccard_sql(
    dialect: str,
    docs_rel: str = "documents",
    shingle_k: int = 5,
    min_ppm: int = 100_000,
) -> str:
    """Exact Jaccard over the inverted shingle index for every pair sharing
    ≥1 shingle, thresholded. The shuffle key is the shingle — document-
    frequency skew is the classic hot key; production adds a stop-shingle
    filter (drop shingles in >X% of docs), expressed here as HAVING with
    a RELATIVE cap: max(100, 10% of the corpus). An absolute cap goes
    scale-vacuous — at 10× the docs, a near-dup FAMILY's shared shingles
    exceed it and every true pair silently drops out (caught by the
    sf0.1 sweep: 0 pairs under df<=100 while MinHash found 17k)."""
    return f"""
        WITH sh AS (
          SELECT doc_id, {_unnest(shingles('text', shingle_k, dialect), 'sh', dialect)}
          FROM {docs_rel}
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        df AS (SELECT sh FROM sh GROUP BY sh
               HAVING count(*) <= greatest(
                 100, (SELECT count(*) FROM {docs_rel}) / 10)),
        pairs AS (
          SELECT s1.doc_id AS doc_a, s2.doc_id AS doc_b, count(*) AS inter
          FROM sh s1
          JOIN df ON df.sh = s1.sh
          JOIN sh s2 ON s2.sh = s1.sh AND s1.doc_id < s2.doc_id
          GROUP BY s1.doc_id, s2.doc_id
        )
        SELECT p.doc_a, p.doc_b,
               CAST(round(1e6 * p.inter / (za.n + zb.n - p.inter)) AS BIGINT)
                 AS jacc_ppm
        FROM pairs p
        JOIN sizes za ON za.doc_id = p.doc_a
        JOIN sizes zb ON zb.doc_id = p.doc_b
        WHERE round(1e6 * p.inter / (za.n + zb.n - p.inter)) >= {min_ppm}
    """


# -- winnowing fingerprints (Schleimer et al. 2003) ---------------------------


def winnowing_sql(
    dialect: str,
    docs_rel: str = "documents",
    k: int = 5,
    w: int = 4,
    min_shared: int = 4,
) -> str:
    """Winnowing fingerprint matching (Schleimer, Wilkerson, Aiken 2003,
    the MOSS local document-fingerprinting algorithm): hash every
    ``k``-word gram IN ORDER, slide a window of ``w`` consecutive gram
    hashes, select each window's minimum — the guarantee the selection
    gives (unlike MinHash's whole-document sketch) is LOCAL: any shared
    run of at least k+w-1 words between two documents is certain to
    share at least one selected fingerprint. Documents sharing
    ``min_shared``+ fingerprints are reported with both fingerprint-set
    sizes for context.

    The fingerprint SET per document is exactly the distinct
    window-minima (every selected position's hash is some window's min,
    and every window's min is a selected position), so no positional
    tie-breaking is needed — the classic SQL-friendly statement of the
    algorithm.

    Plan shape at 100 TB: one explode (grams), one per-doc window pass
    (min over w ROWS — partition-local, no extra shuffle beyond the
    per-doc partitioning), DISTINCT per doc, then the same inverted-
    index equi-join as n-gram Jaccard with the same RELATIVE
    stop-fingerprint cap (df ≤ max(100, |corpus|/10)) so one boilerplate
    fingerprint cannot quadratically flood the pair space. The window
    min is computed by the engines' native frame aggregation — ordered
    ROWS frames cost O(1) amortized per row in both.
    """
    if dialect == SPARK:
        grams = f"""grams AS (
          SELECT doc_id, i,
                 {h60(f"array_join(slice(words, i + 1, {k}), ' ')", SPARK)}
                   AS h
          FROM wf LATERAL VIEW explode(sequence(0, size(words) - {k})) t AS i
        )"""
        wdef = (
            f"w AS (SELECT doc_id, split(text, ' ') AS words "
            f"FROM {docs_rel}),\n        "
            f"wf AS (SELECT * FROM w WHERE size(words) >= {k})"
        )
    else:
        grams = f"""g0 AS (
          SELECT doc_id, unnest(range(0, len(words) - {k} + 1)) AS i, words
          FROM wf
        ),
        grams AS (
          SELECT doc_id, i,
                 {h60(f"array_to_string(list_slice(words, i + 1, i + {k}), ' ')", DUCK)}
                   AS h
          FROM g0
        )"""
        wdef = (
            f"w AS (SELECT doc_id, string_split(text, ' ') AS words "
            f"FROM {docs_rel}),\n        "
            f"wf AS (SELECT * FROM w WHERE len(words) >= {k})"
        )
    return f"""
        WITH {wdef},
        {grams},
        wm AS (
          SELECT doc_id, i,
                 min(h) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW
                              AND {w - 1} FOLLOWING) AS wmin,
                 count(*) OVER (PARTITION BY doc_id) AS ng
          FROM grams
        ),
        fps AS (
          -- greatest(ng - w, 0): a doc with fewer than w grams still
          -- contributes the min over ALL its grams (the i = 0 window
          -- covers them), matching classic winnowing — otherwise short
          -- docs emit no fingerprints and even exact duplicates of them
          -- are invisible to the pair join.
          SELECT DISTINCT doc_id, wmin AS fp FROM wm
          WHERE i <= greatest(ng - {w}, 0)
        ),
        sizes AS (SELECT doc_id, count(*) AS nfp FROM fps GROUP BY doc_id),
        df AS (
          SELECT fp FROM fps GROUP BY fp
          HAVING count(*) <= greatest(
            100, (SELECT count(*) FROM {docs_rel}) / 10)
        ),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS n_shared
          FROM fps a
          JOIN df ON df.fp = a.fp
          JOIN fps b ON b.fp = a.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT p.doc_a, p.doc_b,
               {_bigint('p.n_shared', dialect)} AS n_shared,
               {_bigint('za.nfp', dialect)} AS nfp_a,
               {_bigint('zb.nfp', dialect)} AS nfp_b
        FROM pairs p
        JOIN sizes za ON za.doc_id = p.doc_a
        JOIN sizes zb ON zb.doc_id = p.doc_b
        WHERE p.n_shared >= {min_shared}
    """


# -- train/eval decontamination ----------------------------------------------


def decontaminate_sql(
    dialect: str,
    docs_rel: str = "documents",
    shingle_k: int = 13,
    eval_mod: int = 23,
) -> str:
    """Benchmark decontamination: flag every TRAIN document sharing at
    least one ``shingle_k``-char shingle with any EVAL document (the
    deterministic eval set = doc_id % eval_mod == 0 — stands in for a
    held-out benchmark), with the shared-shingle count as evidence.

    The canonical pre-training hygiene pass (n-gram overlap against
    benchmark suites). Plan shape: both sides explode to (doc, shingle
    HASH) rows; the eval side is tiny and distinct-reduced, so at scale
    it BROADCASTS and the train side streams through a hash semi-join —
    no shuffle of the corpus. Long shingles (13 chars) make coincidental
    hits rare; the hash is the cross-engine h60."""
    sh = shingles("text", shingle_k, dialect)
    return f"""
        WITH train_sh AS (
          SELECT doc_id, {h60('sh', dialect)} AS hsh
          FROM (SELECT doc_id, {_unnest(sh, 'sh', dialect)}
                FROM {docs_rel} WHERE doc_id % {eval_mod} <> 0) t
        ),
        eval_sh AS (
          SELECT DISTINCT {h60('sh', dialect)} AS hsh
          FROM (SELECT doc_id, {_unnest(sh, 'sh', dialect)}
                FROM {docs_rel} WHERE doc_id % {eval_mod} = 0) e
        )
        SELECT t.doc_id,
               CAST(count(DISTINCT t.hsh) AS BIGINT) AS shared_shingles
        FROM train_sh t JOIN eval_sh e ON e.hsh = t.hsh
        GROUP BY t.doc_id
    """
