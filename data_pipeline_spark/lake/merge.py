"""MERGE INTO — CDC upsert/delete application onto the lake table.

Semantics (the reference's reactive upsert family, SURVEY.md §2.2 K1-K6;
reference: scripts/register_v1.py:130-155, scripts/s3_item_cleanup.py:196-238):

    MERGE INTO target t USING batch s ON t.url = s.url
      WHEN MATCHED AND s.op = 'delete'                 THEN DELETE
      WHEN MATCHED AND s.lsn > t.lsn                   THEN UPDATE *
      WHEN NOT MATCHED AND s.op != 'delete'            THEN INSERT *

Physical strategy (Spark-first, not a join translation):

1. **Batch LWW collapse** — ``groupBy(url).agg(max_by(struct(*), lsn))``.
   Unlike a ``row_number`` window, a hash aggregate gets **map-side partial
   aggregation**: a hot url's thousands of events collapse locally on each
   input partition before the shuffle, so url-domain hot keys cannot skew
   the exchange. This is the engine's built-in answer to the skew clause of
   the north_star (plus AQE skew handling for the residual shuffle).
2. **Bucket pruning** — only the hash buckets present in the batch are read
   from the target (O(batch), not O(table)); at 100 TB the merge cost is
   proportional to touched buckets exactly like Iceberg's storage-partitioned
   merge.
3. **Union + LWW instead of full-outer join** — target rows enter the same
   max-LSN-wins aggregate as batch rows (targets carry their stored lsn; a
   target row only loses to a strictly newer batch row, which *is* the
   ``s.lsn > t.lsn`` condition). One shuffle total; no null-handling
   asymmetry. Delete winners persist as hidden TOMBSTONES (payload nulled,
   ``__deleted`` marker) so a late event older than an applied delete
   still loses the lsn race instead of resurrecting the key; readers
   never see tombstones and retention_sweep ages them out.
4. **Atomic snapshot commit** keyed by ``commit_key`` — replaying the same
   batch (task retry, stream restart) is a no-op (exactly-once).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import (
    BUCKET_COL,
    TOMBSTONE_COL,
    LakeTable,
    Snapshot,
)

OP_COL = "op"
DELETE_OP = "delete"
ORDER_COL = "lsn"


@dataclass
class MergeStats:
    commit_key: str
    applied: bool
    version: int
    touched_buckets: int
    batch_rows: int | None = None
    extra: dict[str, Any] | None = None


def lww_collapse(df: DataFrame, key: str, order: str, cols: list[str]) -> DataFrame:
    """max-LSN-wins collapse via hash aggregate (map-side combine, skew-proof)."""
    packed = df.groupBy(key).agg(F.max_by(F.struct(*cols), F.col(order)).alias("__w"))
    return packed.select(key, *[F.col(f"__w.{c}").alias(c) for c in cols])


def merge_into(
    table: LakeTable,
    source: DataFrame,
    commit_key: str,
    with_stats: bool = False,
    precollapsed: bool = False,
    touched: set[int] | None = None,
) -> MergeStats:
    """Apply one batch of change events (current-schema cols + ``op``).

    ``precollapsed=True`` promises the source already holds at most one row
    per key (the caller ran the LWW collapse, e.g. to scope the extraction
    UDF to winners only) — the within-batch collapse is then skipped; the
    vs-target collapse still runs.

    ``touched`` overrides touched-bucket discovery. Passing a superset of
    the truly-touched buckets is always CORRECT (extra buckets are
    rewritten with their existing content) — callers with dense batches
    (every bucket hit, e.g. a uniform backlog replay) pass all buckets and
    save one scan per batch; sparse feeds leave it None for pruning.
    """
    snap: Snapshot = table.current()
    if commit_key in snap.commits:
        return MergeStats(commit_key, False, snap.version, 0)

    key = snap.key
    fields = table.schema_fields(snap)
    data_cols = [n for n, _ in fields if n != key]

    if touched is None:
        # Touched-bucket discovery BEFORE any heavy transform: a column-
        # pruned scan of just the key column, distinct ≤ n_buckets rows.
        touched = {
            int(r[0])
            for r in source.select(
                table.bucket_expr(snap, key).alias(BUCKET_COL)
            )
            .distinct()
            .collect()
        }

    # Align the batch to the current schema: columns added by a schema
    # evolution mid-stream appear as typed NULLs for pre-evolution events
    # (Iceberg add-column read semantics).
    have = set(source.columns)
    src = source.select(
        F.col(key),
        *[
            (F.col(n).cast(d) if n in have else F.lit(None).cast(d)).alias(n)
            for n, d in fields
            if n != key
        ],
        F.col(OP_COL),
    )

    if not precollapsed:
        src = lww_collapse(src, key, ORDER_COL, data_cols + [OP_COL])

    batch_rows = src.count() if with_stats else None

    # Tombstones: the target is read WITH its tombstone rows, and delete
    # winners are kept as tombstones (payload nulled) rather than dropped.
    # Otherwise a late, out-of-order event OLDER than an applied delete
    # would find no matching row and resurrect the key — LWW order-
    # independence requires remembering the delete's lsn. Readers never
    # see tombstones (table.read filters them); retention_sweep purges
    # old ones (the reference's cleanup cron analog).
    target = table.read(buckets=touched, snap=snap, include_tombstones=True)
    target = target.withColumn(
        OP_COL,
        F.when(F.col(TOMBSTONE_COL), F.lit(DELETE_OP)).otherwise(F.lit("update")),
    ).drop(TOMBSTONE_COL)
    merged = lww_collapse(
        target.unionByName(src), key, ORDER_COL, data_cols + [OP_COL]
    )
    # Tombstones keep only the fence columns (lsn for the LWW race,
    # warc_ts so retention_sweep can age them out); payload columns null.
    is_del = F.col(OP_COL) == DELETE_OP
    keep_cols = {ORDER_COL, "warc_ts"}
    final = merged.select(
        key,
        *[
            (
                F.col(c)
                if c in keep_cols
                else F.when(is_del, F.lit(None).cast(dict(fields)[c]))
                .otherwise(F.col(c))
                .alias(c)
            )
            for c in data_cols
        ],
        is_del.alias(TOMBSTONE_COL),
    )

    new_snap = table.commit_buckets(
        final,
        touched,
        commit_key,
        summary={"batch_rows": batch_rows},
    )
    return MergeStats(
        commit_key=commit_key,
        applied=True,
        version=new_snap.version,
        touched_buckets=len(touched),
        batch_rows=batch_rows,
    )
