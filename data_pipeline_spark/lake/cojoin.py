"""Storage-partitioned join over co-bucketed lake tables.

Two tables whose layouts share the SAME bucket routing (n_buckets, split
depths — the key hash is xxhash64(key) in both by construction) partition
any key-equality join: matching keys can only meet inside the same bucket
id. The join therefore decomposes into one small per-bucket join unioned
over buckets — Iceberg's storage-partitioned join / Hive's bucket
map-join. No table-wide shuffle exchange exists in the plan: on fully
compacted buckets each side of a per-bucket join is a bare file scan and
the per-bucket join broadcasts its smaller side (the engine default).
If BOTH sides of one bucket are too big to broadcast, Spark shuffles
that bucket's rows — but the exchange is bounded by the bucket, never
the table (plain parquet scans can't report co-partitioning to the
planner; Iceberg's DSv2 KeyGroupedPartitioning is what removes even the
per-bucket exchange, and a bucket split — :meth:`LakeTable.split_bucket`
— shrinks any bucket that outgrows broadcast).

At 100 TB this is the difference between shuffling both tables across the
wire (the default SortMergeJoin on a join of two big tables) and reading
each bucket once where it lives. The reference's analog is its per-prefix
fan-out: work is sharded by the same key layout on both sides
(scripts/prestage_source.py:252-270 lists and diffs per prefix).

Empty buckets are skipped manifest-side (inner joins skip when EITHER
side is empty), so the unioned plan holds only buckets that can produce
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_pipeline_spark.lake.table import LakeTable


def cobucketed_join(
    left: LakeTable,
    right: LakeTable,
    how: str = "inner",
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    rsuffix: str = "_r",
) -> DataFrame:
    """Join ``left`` and ``right`` on their key columns without a
    table-wide shuffle, exploiting the shared bucket layout.

    The tables must agree on ``n_buckets`` and split depths (raises
    ``ValueError`` otherwise — fall back to a plain join). Column
    projections prune each side's scan; right-side columns whose names
    clash with the left (the structural ``lsn`` always does) come back
    with ``rsuffix`` appended. The right key column is dropped (it equals
    the left key on every joined row).
    """
    snap_l, snap_r = left.current(), right.current()
    if snap_l.n_buckets != snap_r.n_buckets or snap_l.depths != snap_r.depths:
        raise ValueError(
            "tables are not co-bucketed: "
            f"n_buckets {snap_l.n_buckets}/{snap_r.n_buckets}, "
            f"depths {snap_l.depths}/{snap_r.depths}"
        )
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"unsupported join type: {how}")

    parts: list[DataFrame] = []
    for b in sorted(snap_l.manifests, key=int):
        l_has = bool(left.bucket_entries(snap_l, b))
        r_has = bool(right.bucket_entries(snap_r, b))
        if not l_has or (how == "inner" and not r_has):
            continue
        ldf = left.read(
            snap=snap_l, buckets={int(b)}, columns=left_columns
        )
        rdf = right.read(
            snap=snap_r, buckets={int(b)}, columns=right_columns
        )
        clash = (set(ldf.columns) & set(rdf.columns)) - {snap_r.key}
        for c in clash:
            rdf = rdf.withColumnRenamed(c, c + rsuffix)
        cond = ldf[snap_l.key] == rdf[snap_r.key]
        joined = ldf.join(rdf, cond, how).drop(rdf[snap_r.key])
        parts.append(joined)

    if not parts:
        # Schema-faithful empty result: join two empty reads.
        ldf = left.read(snap=snap_l, buckets=set(), columns=left_columns)
        rdf = right.read(snap=snap_r, buckets=set(), columns=right_columns)
        clash = (set(ldf.columns) & set(rdf.columns)) - {snap_r.key}
        for c in clash:
            rdf = rdf.withColumnRenamed(c, c + rsuffix)
        return ldf.join(
            rdf, ldf[snap_l.key] == rdf[snap_r.key], how
        ).drop(rdf[snap_r.key])
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle exchange (broadcast
    exchanges are allowed — they move only the small side)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan:
        raise AssertionError(
            "plan contains a shuffle exchange:\n" + plan[:4000]
        )
