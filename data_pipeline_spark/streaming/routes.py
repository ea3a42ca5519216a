"""Routed multi-table CDC sync: ONE change feed fanned out into N lake
tables by predicate, every epoch published all-or-nothing across the
routed tables.

This is the Flink-CDC "database sync" / Paimon multi-table-sink shape:
a single WAL tail carries events for many logical destinations (shards,
tenants, languages, host classes), and each micro-batch must either land
in EVERY destination it touches or in none — otherwise a crash between
per-table commits leaves the destinations mutually inconsistent with no
record of which half-applied. Reference analog: the watcher loop fans
one polled change window out to per-collection pipelines and re-drives
the whole window on failure (scripts/watch_cdse_and_process.py:241-277);
here the window is an epoch and the re-drive is exact, not best-effort.

Layering (everything below already exists; this module only composes):

1. The epoch's rows are re-read as a batch scan
   (:func:`~data_pipeline_spark.streaming.pipeline.reread_wal_paths`).
2. ONE narrow aggregate over the epoch decides which routes are
   non-empty (and whether any row matched no route) — N filtered scans
   are then run only for the non-empty routes, each with its predicate
   pushed to the parquet scan.
3. Each non-empty route stages a FULL apply pipeline (winner selection →
   extraction → merge-on-read delta commit) as a write-audit-publish
   commit via :meth:`MultiTableTransaction.stage_with` — invisible
   everywhere until the transaction's manifest lands.
4. ``txn.commit()`` is the epoch's commit point: after it, crash
   recovery finishes the remaining publishes; before it, nothing
   happened anywhere. Re-delivery of the epoch (the foreachBatch
   double-fire) no-ops per table on the epoch commit key.

Scale notes (10^10 events, 1000 executors): routing adds one narrow
aggregate per epoch plus one PRUNED scan per non-empty route — the
filter and the (url, lsn) projection reach the parquet reader, so a
route matching 1% of the feed reads ~1% of the bytes (row-group
pruning), and each route's apply keeps the O(batch) merge-on-read write
path. The transaction adds O(routes) driver-side file operations per
epoch, no data movement. Routing on a MUTABLE column is the classic CDC
fan-out pitfall (a key's delete can route away from its inserts); route
on key-derived predicates — the guard below refuses predicates that
reference payload columns unless ``allow_mutable_routing=True``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.lake.txn import (
    MultiTableTransaction,
    recover_transactions,
)
from data_pipeline_spark.pipeline import apply_batch, ensure_table
from data_pipeline_spark.streaming.pipeline import (
    EPOCH_KEY,
    reread_wal_paths,
    wal_stream,
)

# Columns routing predicates may reference by default: the key and the
# immutable event coordinates. lang/html are payload — an update can move
# them, splitting one key's history across tables (deletes then miss).
STABLE_COLS = frozenset({"url", "lsn", "warc_ts", "op"})


def _referenced_cols(spark: SparkSession, pred: str) -> set[str]:
    """Column names a predicate references, resolved by the analyzer
    against the WAL schema (not by string matching): one analysis pass,
    then the Project node's attribute references."""
    from data_pipeline_spark.streaming.pipeline import WAL_SCHEMA

    probe = spark.createDataFrame([], WAL_SCHEMA).select(
        F.expr(pred).alias("__p")
    )
    it = probe._jdf.queryExecution().analyzed().references().iterator()
    cols = set()
    while it.hasNext():
        cols.add(it.next().name())
    return cols


def run_routed_stream(
    spark: SparkSession,
    wal_dir: str,
    routes: dict[str, tuple[str, str | None]],
    checkpoint_dir: str,
    txn_dir: str,
    n_buckets: int = 16,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    unmatched: str = "error",
    allow_mutable_routing: bool = False,
    fail_after_batches: int | None = None,
    fail_mode: str = "before",
) -> StreamingQuery:
    """Tail one WAL and fan each epoch out into several lake tables,
    all-or-nothing per epoch.

    ``routes`` maps route name -> ``(table_root, predicate)``. Each
    predicate is a SQL boolean over the WAL columns; a row lands in
    EVERY route whose predicate is true (overlap is legal — fan-out).
    Exactly one route may carry predicate ``None``: the DEFAULT route,
    receiving rows that match no explicit predicate. ``unmatched``
    decides what happens to rows matching nothing when no default route
    exists: ``"error"`` (default — silent data loss in a CDC sync is a
    bug) stops the stream loudly; ``"drop"`` discards them.

    Epoch atomicity: all routed commits for one epoch publish through a
    single :class:`MultiTableTransaction` whose manifest write is the
    commit point. Crash before it → no table shows the epoch (offsets
    not checkpointed, full redelivery). Crash after it (including the
    classic post-commit double-fire, ``fail_mode="after"``) → startup
    recovery (:func:`recover_transactions`, run here) finishes the
    publishes and the redelivered epoch no-ops on the per-table commit
    keys. Per-table reads stay snapshot-consistent as always; cross-table
    isolation mid-publish follows the transaction module's contract.
    """
    if unmatched not in ("error", "drop"):
        raise ValueError(f"unknown unmatched policy {unmatched!r}")
    defaults = [n for n, (_r, p) in routes.items() if p is None]
    if len(defaults) > 1:
        raise ValueError(f"multiple default routes: {defaults}")
    if not allow_mutable_routing:
        for name, (_root, pred) in routes.items():
            if pred is None:
                continue
            bad = _referenced_cols(spark, pred) - STABLE_COLS
            if bad:
                raise ValueError(
                    f"route {name!r} predicate references mutable payload "
                    f"column(s) {sorted(bad)}: a key's UPDATE can move "
                    "between tables and its DELETE can miss its inserts. "
                    "Route on key-derived predicates, or pass "
                    "allow_mutable_routing=True if the column is "
                    "immutable by feed contract."
                )
    # Finish any transaction a previous incarnation decided but did not
    # fully publish — BEFORE new epochs stack on top of it.
    if os.path.isdir(txn_dir):
        recover_transactions(spark, txn_dir)
    tables: dict[str, LakeTable] = {
        name: ensure_table(spark, root, n_buckets)
        for name, (root, _p) in routes.items()
    }
    preds: dict[str, str] = {
        name: p for name, (_r, p) in routes.items() if p is not None
    }
    any_pred = (
        " OR ".join(f"coalesce(({p}), false)" for p in preds.values())
        or "false"
    )
    seen = {"n": 0}

    def apply_epoch(batch: DataFrame, batch_id: int) -> None:
        crash = (
            fail_after_batches is not None and seen["n"] >= fail_after_batches
        )
        if crash and fail_mode == "before":
            raise RuntimeError("injected mid-replay failure (before apply)")
        batch = reread_wal_paths(batch)
        # One narrow job: per-route matched counts + unmatched count.
        counts = batch.agg(
            *[
                F.sum(
                    F.when(F.expr(p).cast("boolean"), 1).otherwise(0)
                ).alias(n)
                for n, p in preds.items()
            ],
            F.sum(
                F.when(~F.coalesce(F.expr(any_pred), F.lit(False)), 1)
                .otherwise(0)
            ).alias("__rest"),
        ).first()
        rest = counts["__rest"] or 0
        if rest and not defaults and unmatched == "error":
            raise RuntimeError(
                f"epoch {batch_id}: {rest} row(s) matched no route and no "
                "default route exists (unmatched='error')"
            )
        commit_key = EPOCH_KEY.format(n=batch_id)
        txn = MultiTableTransaction(txn_dir, txn_id=f"route-e{batch_id}")
        staged_any = False
        for name in routes:
            if name in preds:
                if not (counts[name] or 0):
                    continue
                part = batch.filter(F.expr(preds[name]).cast("boolean"))
            else:
                if not rest:
                    continue
                part = batch.filter(
                    ~F.coalesce(F.expr(any_pred), F.lit(False))
                )
            tbl = tables[name]
            txn.stage_with(
                tbl,
                commit_key,
                lambda sid, t=tbl, p=part: apply_batch(
                    t, p, commit_key, stage_id=sid, record_metrics=False
                ),
            )
            staged_any = True
        if staged_any:
            txn.commit()
        seen["n"] += 1
        if crash and fail_mode == "after":
            raise RuntimeError(
                "injected post-commit failure (before checkpoint)"
            )

    writer = (
        wal_stream(spark, wal_dir, max_files_per_trigger, paths_only=True)
        .writeStream.foreachBatch(apply_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def routed_stream_to_completion(
    spark: SparkSession,
    wal_dir: str,
    routes: dict[str, tuple[str, str | None]],
    checkpoint_dir: str,
    txn_dir: str,
    timeout_s: int = 300,
    **kwargs,
) -> dict[str, LakeTable]:
    """Drain the WAL backlog through the routed sync; return the tables."""
    q = run_routed_stream(
        spark, wal_dir, routes, checkpoint_dir, txn_dir,
        available_now=True, **kwargs,
    )
    q.awaitTermination(timeout_s)
    return {
        name: LakeTable(spark, root) for name, (root, _p) in routes.items()
    }
