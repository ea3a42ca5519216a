"""As-of (temporal) join: for each probe row, the latest build row with the
same key and event time at-or-before the probe's event time.

Reference analog: the ingest path probes the latest registered state for an
item before deciding what to write (store key/ts probe,
scripts/ingest_v1_s1_rtc.py:110-123); generally "what did the table say
about this url when this event happened".

Spark has no ASOF JOIN primitive. The scalable plan is the union+window
form, NOT probe×build join-then-filter:

* tag probe and build rows, union them (no shuffle yet),
* one exchange on the key, in-partition sort by (ts, tag) — build rows
  sort before probe rows at equal timestamps so ties match (<= semantics,
  same as DuckDB/pandas ASOF),
* ``last_value(ignorenulls)`` over the running window carries the latest
  build values forward onto every probe row.

One shuffle total, no data-dependent blow-up (a join-then-filter plan
produces |probe| × |matching build| intermediate rows — quadratic for hot
keys, fatal at web scale where a hot url has millions of versions). Skew:
the window partitions by the join key, so a hot key lands on one task;
at 100 TB, range-partition within key by time (the standard two-level
as-of sharding) — the operator keeps the simple shape because CDC probe
sets are per-batch sized.

Oracle: DuckDB's native ``ASOF LEFT JOIN`` (queries.cdc_asof_join) —
decision-level parity between this plan and a specialized engine
implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str = "url",
    ts: str = "warc_ts",
    suffix: str = "_matched",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of left join: every ``probe`` row, joined to the latest
    ``build`` row with the same ``on`` key and ``build.ts <= probe.ts``
    (ties match). Unmatched probes keep NULL build columns.

    ``tolerance_s`` (pandas ``merge_asof`` analog): matches older than
    this many seconds before the probe are discarded (NULLed).

    Build value columns (everything but the key) come back suffixed; the
    build's own ``ts`` returns as ``{ts}{suffix}``."""
    val_cols = [c for c in build.columns if c != on]
    b_types = dict(build.dtypes)
    p = probe.select(
        F.col(on),
        F.col(ts).alias("__ts"),
        F.struct(*probe.columns).alias("__p"),
        F.lit(1).alias("__is_probe"),
        *[
            F.lit(None).cast(b_types[c]).alias(f"__b_{c}")
            for c in val_cols
        ],
    )
    b = build.select(
        F.col(on),
        F.col(ts).alias("__ts"),
        F.lit(None).cast(p.schema["__p"].dataType).alias("__p"),
        F.lit(0).alias("__is_probe"),
        *[F.col(c).alias(f"__b_{c}") for c in val_cols],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = {
        c: F.last(f"__b_{c}", ignorenulls=True).over(w) for c in val_cols
    }
    out = (
        p.unionByName(b)
        .select(
            "__p",
            "__ts",
            F.col("__is_probe"),
            *[m.alias(f"__m_{c}") for c, m in matched.items()],
        )
        .filter(F.col("__is_probe") == 1)
    )
    keep: dict[str, Column] = {
        c: F.col(f"__m_{c}") for c in val_cols
    }
    if tolerance_s is not None:
        stale = (
            F.col("__ts").cast("long")
            - F.col(f"__m_{ts}").cast("long")
        ) > F.lit(tolerance_s)
        keep = {
            c: F.when(stale, F.lit(None)).otherwise(col)
            for c, col in keep.items()
        }
    return out.select(
        *[F.col(f"__p.{c}").alias(c) for c in probe.columns],
        *[col.alias(f"{c}{suffix}") for c, col in keep.items()],
    )
