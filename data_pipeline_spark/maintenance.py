"""Table maintenance jobs: retention sweep (TTL deletes) and backfill
(migration/schema-evolution data fixes).

Reference analogs:
* retention — expires stamping at write + cleanup cron with an
  order-sensitive guard matrix and idempotent deletes
  (scripts/register_v1.py:487-516, scripts/cleanup_expired_items.py:67-127,
  scripts/s3_item_cleanup.py:196-238);
* backfill — composable MigrationFn passes over every record with
  outcome histograms that must reconcile
  (operator-tools/_migrate_catalog/runner.py:73-86,
  migrations/stamp_expires.py:78-181).

Both are expressed as ONE declarative pass over the table committed
atomically through the same snapshot protocol as the merge path — a crash
mid-job leaves the previous snapshot live (the reference's torn-write
lesson), and re-running with the same commit key is a no-op.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable


@dataclass
class SweepStats:
    commit_key: str
    applied: bool
    gate_counts: dict[str, int]


def classify_expired(
    df: DataFrame,
    now: Column,
    retention_days: int = 14,
    exclude: Column | None = None,
    ts_col: str = "warc_ts",
) -> Column:
    """The ordered guard matrix as one chained CASE (order-sensitive, like
    the reference's delete gate): excluded → not_expired → delete."""
    expires = F.col(ts_col) + F.expr(f"INTERVAL {retention_days} DAY")
    gate = F.when(exclude if exclude is not None else F.lit(False), "excluded")
    return gate.when(expires >= now, "not_expired").otherwise("delete")


def retention_sweep(
    table: LakeTable,
    commit_key: str,
    retention_days: int = 14,
    now: Column | None = None,
    exclude: Column | None = None,
) -> SweepStats:
    """Delete expired rows (event-time older than retention) atomically.

    Emits the per-gate audit histogram BEFORE committing (the reference
    writes one audit record per item; here one count per gate) and keeps
    the reconciliation invariant: sum(gates) == table rows before sweep.
    """
    snap = table.current()
    if commit_key in snap.commits:
        return SweepStats(commit_key, False, {})
    df = table.read(snap=snap)
    if now is None:
        # Deterministic "now": the max event time in the table — tests and
        # replays must not depend on wall-clock (reference lesson: cache
        # eviction keyed on acquisition date, not mtime).
        now = F.lit(df.agg(F.max("warc_ts")).first()[0])
    gated = df.withColumn(
        "__gate", classify_expired(df, now, retention_days, exclude)
    )
    counts = {
        r["__gate"]: r["n"]
        for r in gated.groupBy("__gate").agg(F.count("*").alias("n")).collect()
    }
    survivors = gated.filter(F.col("__gate") != "delete").drop("__gate")
    table.commit_buckets(
        survivors,
        touched=set(range(snap.n_buckets)),
        commit_key=commit_key,
        summary={"op": "retention_sweep", "gates": counts},
    )
    return SweepStats(commit_key, True, counts)


def backfill(
    table: LakeTable,
    commit_key: str,
    exprs: dict[str, Column],
    where: Column | None = None,
) -> bool:
    """Migration pass: set columns via expressions over the whole table
    (optionally row-gated), one atomic full-rewrite commit.

    Compose multiple migrations by passing several exprs — they apply in
    one scan like the reference's single-pass composed MigrationFns.
    Typical use right after ``evolve_schema(add_columns=...)`` to populate
    the new column for pre-evolution rows.
    """
    snap = table.current()
    if commit_key in snap.commits:
        return False
    df = table.read(snap=snap)
    for name, expr in exprs.items():
        if name not in df.columns:
            raise KeyError(f"backfill target column {name} not in schema")
        if where is not None:
            expr = F.when(where, expr).otherwise(F.col(name))
        df = df.withColumn(name, expr)
    table.commit_buckets(
        df,
        touched=set(range(snap.n_buckets)),
        commit_key=commit_key,
        summary={"op": "backfill", "columns": sorted(exprs)},
    )
    return True
