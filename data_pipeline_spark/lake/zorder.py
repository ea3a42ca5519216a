"""Z-order (Morton-curve) clustering expression for compaction rewrites.

Multi-dimensional clustering: interleave the bits of per-column bin ids so
rows close in EVERY clustered dimension land close in the sort order —
after a clustered rewrite each output file covers a small rectangle of the
(col1, col2, ...) space and manifest min/max stats prune files for
predicates on ANY clustered column, not just the leading one (the
Delta/Iceberg OPTIMIZE ZORDER BY analog; lexicographic sort only serves
the leading column).

Bin assignment is computed inside the rewrite's existing shuffle:

* numeric / timestamp columns → equal-width bins between the global min
  and max (one tiny agg job per rewrite; the bounds job scans only the
  clustered columns, Catalyst prunes the rest),
* string columns → ``crc32(col) % n_bins`` — hashing keeps no ORDER
  locality but preserves EQUALITY locality, which is what low-cardinality
  attributes (lang) need for file skipping.

Everything is a JVM-side Column expression (shift/and/or fold) — no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__z"

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
_TEMPORAL = {"timestamp", "timestamp_ntz", "date"}


def _as_long(col: str, dtype: str) -> Column:
    """A sortable BIGINT image of the column (seconds resolution for
    temporals — bin width, not identity, so seconds suffice)."""
    if dtype in _TEMPORAL:
        return F.col(col).cast("timestamp").cast("long")
    return F.col(col).cast("long")


def with_zvalue(
    df: DataFrame, cols: list[str], bits: int = 8
) -> DataFrame:
    """Append ``__z``: the Morton interleave of ``bits``-wide bin ids of
    ``cols``. Deterministic given the data (bin bounds come from the
    data's own min/max, no randomness, no wall clock)."""
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError("z-value must fit in a signed 64-bit integer")
    dtypes = dict(df.dtypes)
    n_bins = 1 << bits
    aggs = []
    for c in cols:
        if dtypes[c] in _NUMERIC or dtypes[c] in _TEMPORAL:
            v = _as_long(c, dtypes[c])
            aggs += [F.min(v).alias(f"mn_{c}"), F.max(v).alias(f"mx_{c}")]
    bounds = df.agg(*aggs).collect()[0].asDict() if aggs else {}

    bin_cols: list[Column] = []
    for c in cols:
        t = dtypes[c]
        if t in _NUMERIC or t in _TEMPORAL:
            mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
            if mn is None or mx is None or mx <= mn:
                bin_cols.append(F.lit(0).cast("long"))
                continue
            v = _as_long(c, t)
            width = (mx - mn + 1) / float(n_bins)
            b = F.floor((v - F.lit(mn)) / F.lit(width)).cast("long")
            bin_cols.append(
                F.coalesce(
                    F.least(b, F.lit(n_bins - 1)), F.lit(0).cast("long")
                )
            )
        else:
            bin_cols.append(
                F.coalesce(
                    (F.crc32(F.col(c).cast("string")) % n_bins).cast(
                        "long"
                    ),
                    F.lit(0).cast("long"),
                )
            )

    k = len(bin_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, bc in enumerate(bin_cols):
            bit = F.shiftright(bc, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return df.withColumn(Z_COL, z)
