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
) -> str:
    """Verified near-duplicate pairs via MinHash signatures + LSH banding.

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
    mins = ", ".join(
        f"min({h60(salted[j], dialect, fast)}) AS m{j}" for j in range(n_hashes)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(concat_ws(',', {', '.join(f'm{b * r + i}' for i in range(r))})) AS bh "
        f"FROM sig"
        for b in range(n_bands)
    )
    return f"""
        WITH sh AS (
          SELECT doc_id, {_unnest(shingles('text', shingle_k, dialect), 'sh', dialect)}
          FROM {docs_rel}
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
        bands AS ({band_rows}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        ),
        verified AS (
          SELECT c.doc_a, c.doc_b, count(*) AS inter
          FROM cand c
          JOIN sh s1 ON s1.doc_id = c.doc_a
          JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.sh = s1.sh
          GROUP BY c.doc_a, c.doc_b
        )
        SELECT v.doc_a, v.doc_b,
               {_bigint('v.inter', dialect)} AS inter,
               {_bigint('za.n', dialect)} AS n_a,
               {_bigint('zb.n', dialect)} AS n_b,
               CAST(round(1e6 * v.inter / (za.n + zb.n - v.inter)) AS BIGINT)
                 AS jacc_ppm
        FROM verified v
        JOIN sizes za ON za.doc_id = v.doc_a
        JOIN sizes zb ON zb.doc_id = v.doc_b
        WHERE round(1e6 * v.inter / (za.n + zb.n - v.inter)) >= {min_ppm}
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
    filter (drop shingles in >X% of docs), expressed here as HAVING."""
    return f"""
        WITH sh AS (
          SELECT doc_id, {_unnest(shingles('text', shingle_k, dialect), 'sh', dialect)}
          FROM {docs_rel}
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        df AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 100),
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
