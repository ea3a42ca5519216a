"""Mergeable distinct-count sketches (HyperLogLog) in pure codegen.

The 100 TB question HLL answers: "distinct urls per <group> across the
whole corpus" without shuffling every url — each partition folds its
rows into m=256 tiny registers (map-side combine on the groupBy), and
register tables MERGE by element-wise max, so per-day / per-shard
sketches roll up into per-month / global ones without touching data
again (the Flajolet et al. 2007 merge property; same shape as Spark's
own approx_count_distinct, re-derived here so the register table itself
is a first-class, storable, ENGINE-PORTABLE artifact).

Determinism contract: everything derives from md5(value) hex text via
string/integer operations only — no platform hash, no libm in the
sketch — so Spark and DuckDB (and any engine with md5 + strpos +
regexp) produce byte-identical register tables. Layout: hex chars
[1,2] → register index (8 bits, m=256); hex chars [3..14] → 48
probe bits; rank = leading-zero bits + 1 ∈ [1, 49].

Only the final ESTIMATE uses doubles (alpha·m²/Σ2^-M and the
linear-counting branch) — fine for an estimator with ~6.5% stddev;
oracles should compare register tables, which are exact.

Reference analog: the reference keeps no sketch machinery at all —
distinct counts there are exact DB aggregates (scripts/
run_ingest_register.py:67-161); this is a scale-path addition.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_REGISTERS = 256
_PROBE_HEX = 12  # 48 probe bits
_MAX_RANK = 4 * _PROBE_HEX + 1

# integer-exact SQL fragments shared (structurally) with the DuckDB
# oracle text below; {pos} is Spark instr / DuckDB strpos
_HEXVAL = "({pos}('0123456789abcdef', substr({h}, {i}, 1)) - 1)"
_REG = f"CAST({_HEXVAL.format(pos='{pos}', h='{h}', i=1)} * 16 + " \
       f"{_HEXVAL.format(pos='{pos}', h='{h}', i=2)} AS BIGINT)"
_LZ4 = (
    "CASE substr({rest}, length(regexp_extract({rest}, '^0*'{g0})) + 1, 1) "
    "WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
    "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
    "ELSE 0 END"
)
_RANK = (
    "CAST(CASE WHEN {rest} = '" + "0" * _PROBE_HEX + f"' THEN {_MAX_RANK} "
    "ELSE 4 * length(regexp_extract({rest}, '^0*'{g0})) + " + _LZ4 +
    " + 1 END AS BIGINT)"
)


def hll_sketch(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Fold ``value_col`` into per-group HLL registers.

    Returns ``group_cols + (reg BIGINT, maxrank BIGINT)`` — at most m=256
    register rows per group regardless of input size. One hash aggregate
    (map-side combine: a partition's billion rows leave it as ≤256·groups
    rows), no window, no Python.
    """
    reg = F.expr(
        _REG.format(pos="instr", h=f"md5(cast({value_col} as string))")
    )
    rank = F.expr(
        _RANK.format(
            rest=f"substr(md5(cast({value_col} as string)), 3, {_PROBE_HEX})",
            g0=", 0",
        )
    )
    return (
        df.select(*group_cols, reg.alias("reg"), rank.alias("maxrank"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("maxrank").alias("maxrank"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables: union + element-wise max. Sketch(A ∪ B) ==
    merge(sketch(A), sketch(B)) exactly — max is associative/commutative/
    idempotent, so shard-level sketches roll up in any order, including
    re-merging overlapping shards."""
    if not sketches:
        raise ValueError("nothing to merge")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "maxrank"]
    return out.groupBy(*keys).agg(F.max("maxrank").alias("maxrank"))


def hll_estimate(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Estimate distinct counts from a register table.

    Returns ``group_cols + (registers_used, s_scaled, est)``:
    ``s_scaled`` = Σ 2^(49-M_j) over hit registers (integer-exact,
    portable), ``est`` = bias-corrected HLL with the standard
    linear-counting small-range branch (doubles — estimator output,
    not a parity surface)."""
    m = M_REGISTERS
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("registers_used"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_MAX_RANK} - maxrank)")
        ).alias("s_scaled"),
    )
    v = F.lit(m) - F.col("registers_used")
    # empty registers contribute 2^-0 = 1 → 2^49 in scaled units
    s_total = F.col("s_scaled") + v * F.lit(1 << _MAX_RANK)
    raw = (
        F.lit(alpha * m * m * float(1 << _MAX_RANK))
        / s_total.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols, "registers_used", "s_scaled",
        F.round(est, 3).alias("est"),
    )


def hll_estimate_exact_py(registers: dict[int, int]) -> float:
    """Reference estimator over a collected {reg: maxrank} dict — exact
    Python ints for the harmonic sum (test oracle)."""
    m = M_REGISTERS
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(1 << (_MAX_RANK - r) for r in registers.values())
    v = m - len(registers)
    s += v << _MAX_RANK
    raw = alpha * m * m * float(1 << _MAX_RANK) / s
    if raw <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return raw


def hll_sketch_duckdb_sql(
    source_sql: str, group_cols: list[str], value_col: str
) -> str:
    """DuckDB text computing the IDENTICAL register table (strpos for
    instr; same md5-hex arithmetic) — the parity oracle for
    :func:`hll_sketch` / :func:`hll_merge`."""
    g = ", ".join(group_cols)
    reg = _REG.format(pos="strpos", h="hx")
    rank = _RANK.format(rest="rest", g0="")
    return f"""
        WITH __src AS ({source_sql}),
        __h AS (SELECT {g}, md5(CAST({value_col} AS VARCHAR)) AS hx
                FROM __src),
        __parts AS (SELECT {g}, {reg} AS reg,
                           substr(hx, 3, {_PROBE_HEX}) AS rest FROM __h)
        SELECT {g}, reg, CAST(max({rank}) AS BIGINT) AS maxrank
        FROM __parts GROUP BY {g}, reg
    """


# ============================================================================
# Count-min sketch (Cormode & Muthukrishnan 2005) — mergeable frequency
# estimates in pure codegen
# ============================================================================
#
# The 100 TB question: "how often does each of these keys occur?" without
# carrying a count per distinct key. Each partition folds its rows into a
# d×w counter grid (one explode to d rows, then a map-side-combining hash
# aggregate), grids MERGE by cell-wise SUM (counts are linear), and a
# point estimate is min over the d cells a key maps to — always ≥ truth,
# within εN with probability 1-δ for w = e/ε, d = ln(1/δ).
#
# Determinism contract (same as HLL above): cells derive from
# md5(row_seed || '|' || value) hex text via strpos arithmetic only; w
# divides 16^4 so `mod` is exactly uniform over the 16-bit slice. Spark
# and DuckDB produce byte-identical grids and estimates.

CMS_D = 4
CMS_W = 1024  # divides 65536 → unbiased mod of the 4-hex-char slice

_HEX4 = (
    f"((({_HEXVAL.format(pos='{pos}', h='{h}', i=1)} * 16 + "
    f"{_HEXVAL.format(pos='{pos}', h='{h}', i=2)}) * 16 + "
    f"{_HEXVAL.format(pos='{pos}', h='{h}', i=3)}) * 16 + "
    f"{_HEXVAL.format(pos='{pos}', h='{h}', i=4)})"
)


def _cms_cell(pos_fn: str, value_expr: str, row: int) -> str:
    h = f"md5(concat('{row}|', cast({value_expr} as string)))"
    return f"CAST({_HEX4.format(pos=pos_fn, h=h)} % {CMS_W} AS BIGINT)"


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Fold ``value_col`` occurrences into per-group count-min grids.

    Returns ``group_cols + (row BIGINT, cell BIGINT, cnt BIGINT)`` — at
    most d·w = 4096 rows per group regardless of input size. One explode
    (d× row inflation of a 2-column projection) + one hash aggregate
    with map-side combine; no window, no Python, no shuffle of payload
    columns."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    pairs = F.array(*[
        F.struct(
            F.lit(j).cast("long").alias("row"),
            F.expr(_cms_cell("instr", value_col, j)).alias("cell"),
        )
        for j in range(CMS_D)
    ])
    return (
        df.select(*group_cols, w.alias("__w"), F.explode(pairs).alias("rc"))
        .select(*group_cols, "rc.row", "rc.cell", "__w")
        .groupBy(*group_cols, "row", "cell")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge grids cell-wise: counts are linear, so sketch(A ⊎ B) ==
    merge(sketch(A), sketch(B)) exactly, in any order/grouping —
    per-shard grids roll up without re-reading data."""
    if not sketches:
        raise ValueError("nothing to merge")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Point-estimate each candidate key's count from a grid.

    ``keys``: one row per (group, candidate value). Each candidate maps
    to its d (row, cell) coordinates (the same explode), left-joins the
    grid (missing cell → 0 — the key was never folded there), and takes
    min over rows. Output: ``group_cols + (value_col, est BIGINT)``;
    est ≥ true count always (integer-exact, engine-portable). The join
    is candidate-sized × ≤4096-per-group — broadcastable whenever the
    candidate set is."""
    pairs = F.array(*[
        F.struct(
            F.lit(j).cast("long").alias("row"),
            F.expr(_cms_cell("instr", value_col, j)).alias("cell"),
        )
        for j in range(CMS_D)
    ])
    coords = keys.select(
        *group_cols, value_col, F.explode(pairs).alias("rc")
    ).select(*group_cols, value_col, "rc.row", "rc.cell")
    joined = coords.join(sketch, [*group_cols, "row", "cell"], "left")
    return (
        joined.groupBy(*group_cols, value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_sketch_duckdb_sql(
    source_sql: str,
    group_cols: list[str],
    value_col: str,
    weight_expr: str = "1",
) -> str:
    """DuckDB text computing the IDENTICAL grid (strpos arithmetic,
    generate_series for the d rows) — the parity oracle."""
    g = ", ".join(group_cols)
    gp = f"{g}, " if g else ""
    cell = _cms_cell("strpos", value_col, 0).replace(
        "md5(concat('0|'", "md5(concat(j.row || '|'"
    )
    return f"""
        WITH __src AS ({source_sql}),
        __j AS (SELECT CAST(range AS BIGINT) AS row
                FROM range({CMS_D})),
        __cells AS (
          SELECT {gp}j.row AS row, {cell} AS cell,
                 CAST({weight_expr} AS BIGINT) AS w
          FROM __src, __j AS j)
        SELECT {gp}row, cell, CAST(sum(w) AS BIGINT) AS cnt
        FROM __cells GROUP BY {gp}row, cell
    """


def cms_estimate_duckdb_sql(
    grid_sql: str,
    keys_sql: str,
    group_cols: list[str],
    value_col: str,
) -> str:
    """DuckDB text for :func:`cms_estimate` over a grid produced by
    :func:`cms_sketch_duckdb_sql` (or a merge of such grids)."""
    g = ", ".join(group_cols)
    gp = f"{g}, " if g else ""
    on = " AND ".join(
        [f"s.{c} = k.{c}" for c in group_cols]
        + ["s.row = k.row", "s.cell = k.cell"]
    )
    kg = ", ".join([f"k.{c}" for c in group_cols] + [f"k.{value_col}"])
    cell = _cms_cell("strpos", value_col, 0).replace(
        "md5(concat('0|'", "md5(concat(j.row || '|'"
    )
    return f"""
        WITH __grid AS ({grid_sql}),
        __keys AS ({keys_sql}),
        __j AS (SELECT CAST(range AS BIGINT) AS row FROM range({CMS_D})),
        __coords AS (
          SELECT {gp}{value_col}, j.row AS row, {cell} AS cell
          FROM __keys, __j AS j)
        SELECT {kg}, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est
        FROM __coords k LEFT JOIN __grid s ON {on}
        GROUP BY {kg}
    """


# ============================================================================
# KMV (k-minimum-values) sketch — mergeable distinct sets with INTERSECTION
# support (Bar-Yossef et al. 2002 / Beyer et al. 2007)
# ============================================================================
#
# HLL registers answer |A| and |A ∪ B| but cannot intersect. A KMV sketch
# keeps the k smallest 48-bit hash values of a set; union merges by
# re-taking the k smallest of the combined sketches, and Jaccard(A, B) is
# estimated by how many of the UNION's k-mins appear in both input
# sketches — so |A ∩ B| ≈ J · |A ∪ B| comes from three tiny register
# tables. Distinct estimate: (k-1) · 2^48 / h_(k) (k-th smallest hash).
#
# Determinism contract: hval is the first 12 hex chars of md5(value) as
# a bigint (strpos polynomial — no platform hash), so Spark and DuckDB
# produce byte-identical sketches. Scale shape: one DISTINCT hash
# aggregate, then a salted two-stage top-k (per-(group, h%64) k-mins
# bound the global sort to ≤ 64·k candidate rows per group).

KMV_K = 64
_HEX_SPACE = 1 << 48


def _hex12_bigint(pos_fn: str, h: str) -> str:
    out = "CAST(0 AS BIGINT)"
    for i in range(1, 13):
        out = (
            f"({out} * 16 + "
            f"{_HEXVAL.format(pos=pos_fn, h=h, i=i)})"
        )
    return f"CAST({out} AS BIGINT)"


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group k smallest distinct md5-derived 48-bit hash values.

    Returns ``group_cols + (pos BIGINT 1..k, hval BIGINT)``. Plan: one
    distinct hash aggregate over (group, hval); then per-(group, salt)
    k-mins (salt = hval % 64) bound the candidates to ≤ 64k rows per
    group before the global per-group rank — the same two-stage trick as
    distributed top-k, exact because the global k smallest are each
    among their own salt's k smallest."""
    from pyspark.sql import Window

    hv = F.expr(
        _hex12_bigint("instr", f"md5(cast({value_col} as string))")
    ).alias("hval")
    d = df.select(*group_cols, hv).distinct()
    salted = Window.partitionBy(
        *group_cols, (F.col("hval") % 64).alias("salt")
    ).orderBy("hval")
    cand = (
        d.withColumn("r1", F.row_number().over(salted))
        .filter(F.col("r1") <= k)
        .drop("r1")
    )
    final = Window.partitionBy(*group_cols).orderBy("hval")
    return (
        cand.withColumn("pos", F.row_number().over(final).cast("long"))
        .filter(F.col("pos") <= k)
        .select(*group_cols, "pos", "hval")
    )


def kmv_merge(*sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Union sketch: k smallest of the combined distinct hash values —
    exactly sketch(A ∪ B) when the inputs were full-k (and a superset
    of it otherwise), so shard sketches roll up without re-reading
    data, including overlapping shards (distinct absorbs duplicates)."""
    from pyspark.sql import Window

    if not sketches:
        raise ValueError("nothing to merge")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("pos", "hval")]
    d = out.select(*keys, "hval").distinct()
    final = Window.partitionBy(*keys).orderBy("hval")
    return (
        d.withColumn("pos", F.row_number().over(final).cast("long"))
        .filter(F.col("pos") <= k)
        .select(*keys, "pos", "hval")
    )


def kmv_estimate_py(hvals: list[int], k: int = KMV_K) -> float:
    """Distinct-count estimate from a collected sketch: exact when the
    set had < k values, else (k-1)·2^48 / h_(k)."""
    if len(hvals) < k:
        return float(len(hvals))
    return (k - 1) * _HEX_SPACE / float(max(hvals))


def kmv_intersection_py(
    a: list[int], b: list[int], k: int = KMV_K
) -> float:
    """|A ∩ B| estimate: union's k-mins that appear in BOTH input
    sketches, scaled by the union's distinct estimate."""
    u = sorted(set(a) | set(b))[:k]
    if not u:
        return 0.0
    overlap = sum(1 for h in u if h in set(a) and h in set(b))
    return overlap / len(u) * kmv_estimate_py(u, k)


def kmv_sketch_duckdb_sql(
    source_sql: str, group_cols: list[str], value_col: str, k: int = KMV_K
) -> str:
    """DuckDB text computing the IDENTICAL sketch (strpos polynomial,
    window rank) — the parity oracle."""
    g = ", ".join(group_cols)
    gp = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    hv = _hex12_bigint("strpos", f"md5(CAST({value_col} AS VARCHAR))")
    return f"""
        WITH __src AS ({source_sql}),
        __d AS (SELECT DISTINCT {gp}{hv} AS hval FROM __src),
        __r AS (SELECT {gp}hval,
                       CAST(row_number() OVER ({part}ORDER BY hval)
                            AS BIGINT) AS pos
                FROM __d)
        SELECT {gp}pos, hval FROM __r WHERE pos <= {k}
    """
