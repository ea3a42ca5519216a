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
