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
2. **Merge-on-read delta commit** — the collapsed batch (delete winners as
   hidden TOMBSTONE rows, payload nulled) is APPENDED as one delta file
   per touched bucket (``LakeTable.commit_delta``): the merge writes
   O(batch) bytes and never reads the target. The ``s.lsn > t.lsn``
   condition resolves at READ time: scans LWW-collapse base+delta rows per
   key on lsn, so a target row only loses to a strictly newer batch row,
   and a late event older than an applied delete loses the lsn race to the
   tombstone instead of resurrecting the key. Compaction
   (``LakeTable.compact``) folds deltas back into one base file per
   bucket on its own cadence — exactly Iceberg's merge-on-read +
   rewrite_data_files split. At 100 TB this is the difference between a
   sparse batch writing O(batch) and rewriting the table.
3. **Atomic snapshot commit** keyed by ``commit_key`` — replaying the same
   batch (task retry, stream restart) is a no-op (exactly-once).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import (
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
    """max-LSN-wins collapse via hash aggregate (map-side combine,
    skew-proof). Ties on the order column — a feed contract violation —
    resolve by max xxhash64 row fingerprint: deterministic across input
    order, partitioning, and retries (byte-identical redelivered copies
    hash equal, so any pick among them is the same row)."""
    tiebreak = F.struct(
        F.col(order).alias("o"),
        F.xxhash64(*[F.col(c) for c in cols]).alias("f"),
    )
    packed = df.groupBy(key).agg(
        F.max_by(F.struct(*cols), tiebreak).alias("__w")
    )
    return packed.select(key, *[F.col(f"__w.{c}").alias(c) for c in cols])


# Safe in-place type promotions (the Iceberg v2 promotion rules): every
# value of the old type is exactly representable in the new one, so old
# files read under the widened schema without a rewrite.
SAFE_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
}

# Pairs that are the same value domain under this engine's pinned-UTC
# sessions (session.get_spark; re-pinned in queries._views): a feed may
# legitimately flip between them per spark.sql.timestampType without any
# schema intent, so neither direction is drift.
_EQUIVALENT = {("timestamp", "timestamp_ntz"), ("timestamp_ntz", "timestamp")}


def schema_drift(
    table: LakeTable, source: DataFrame, snap: Snapshot | None = None
) -> tuple[dict[str, str], dict[str, str]]:
    """What schema evolution would absorb ``source``'s schema into the
    table: ``(add_columns, widen)``. A source column the table lacks is
    an add; a source type STRICTLY WIDER than the table's (per
    :data:`SAFE_WIDENINGS`) is a widen; equal or narrower source types
    need nothing (alignment casts up). Anything else — a string where
    the table holds bigint, a narrowing — raises: silent coercion at a
    CDC boundary corrupts data, so incompatible drift must be resolved
    by an explicit ``evolve_schema`` decision, not a write."""
    snap = snap or table.current()
    fields = dict(table.schema_fields(snap))
    adds: dict[str, str] = {}
    widens: dict[str, str] = {}
    for f in source.schema.fields:
        n = f.name
        if n == OP_COL or n.startswith("__"):
            continue
        d = f.dataType.simpleString()
        if n not in fields:
            adds[n] = d
            continue
        cur = fields[n]
        if d == cur or (d, cur) in SAFE_WIDENINGS or (cur, d) in _EQUIVALENT:
            continue
        if (cur, d) in SAFE_WIDENINGS:
            widens[n] = d
        else:
            raise ValueError(
                f"incompatible schema drift on {n!r}: table has {cur}, "
                f"batch has {d} (neither equal nor a safe widening) — "
                "resolve with an explicit evolve_schema"
            )
    return adds, widens


def absorb_schema_drift(
    table: LakeTable, source: DataFrame, commit_key: str
) -> Snapshot | None:
    """Absorb ``source``'s schema drift as a metadata-only evolution
    commit (the Delta ``mergeSchema`` / Debezium auto-evolution shape).
    Returns the new snapshot, or None when there is no drift. The
    table's declared ``schema.compat`` policy governs: FORWARD/FULL
    tables refuse adds without initial defaults — auto-evolution cannot
    invent a default, so the refusal surfaces loudly to the feed owner.
    Drift-based and therefore replay-safe: after a crash between the
    evolution commit and the data commit, the redelivered batch sees no
    remaining drift and proceeds straight to the merge."""
    adds, widens = schema_drift(table, source)
    if not adds and not widens:
        return None
    return table.evolve_schema(
        add_columns=adds or None, widen=widens or None, commit_key=commit_key
    )


def merge_into(
    table: LakeTable,
    source: DataFrame,
    commit_key: str,
    with_stats: bool = False,
    precollapsed: bool = False,
    props_update: dict[str, Any] | None = None,
    stage_id: str | None = None,
    auto_evolve: bool = False,
    enforce_checks: bool = True,
) -> MergeStats:
    """Apply one batch of change events (current-schema cols + ``op``).

    ``precollapsed=True`` promises the source holds at most one row per
    (key, order) pair EXCEPT for rows tied at a key's winning order value
    (the caller ran the LWW winner selection, e.g. to scope the
    extraction UDF to winners only) — the within-batch collapse is then
    skipped. Tied duplicates are tolerated physically: every read-side
    collapse orders by (order, xxhash64 row fingerprint), so they resolve
    to ONE deterministic winner at read time and compaction folds them
    away; the vs-target resolution happens at read time either way
    (merge-on-read).

    ``props_update`` merges table properties into the committed snapshot
    (the apply path records its watermark here so maintenance can derive
    the tombstone purge fence from it).

    ``stage_id`` stages the merge as a write-audit-publish commit: fully
    written but invisible to readers until ``table.publish_staged`` —
    validate it first with ``quality_gate(table.read(snap=staged))``.
    """
    snap: Snapshot = table.current()
    mode = snap.props.get("merge.mode", "lww")
    if mode != "lww":
        raise ValueError(
            f"merge_into applies whole-row LWW upserts; a "
            f"merge.mode={mode!r} table stores raw events — append them "
            "with commit_delta / pipeline.apply_append_batch instead"
        )
    if commit_key in snap.commits:
        return MergeStats(commit_key, False, snap.version, 0)
    if auto_evolve:
        # Unknown source columns otherwise DROP silently at the
        # alignment below; auto_evolve turns them into a schema
        # evolution commit first (idempotent: replay sees no drift).
        if absorb_schema_drift(table, source, f"{commit_key}~evolve"):
            snap = table.current()
    # Generated columns run on EVERY write path, before constraint
    # enforcement (a CHECK may reference a generated column): omitted
    # columns are computed, supplied ones validated, deletes exempt.
    # No-declaration tables pay one dict lookup.
    from data_pipeline_spark import constraints as _gen_constraints

    source = _gen_constraints.apply_generated(source, table, snap)

    if enforce_checks:
        # Declared CHECK constraints hold on EVERY write path (Delta
        # semantics), not just the streaming apply boundary — a SQL
        # INSERT or a direct merge refuses whole before any commit.
        # apply_batch passes enforce_checks=False: it already enforced
        # (with DLQ quarantine) and must not pay the predicate twice.
        # No-check tables pay nothing (constraints.enforce fast path).
        from data_pipeline_spark import constraints as _constraints

        clean, bad = _constraints.enforce(source, table, snap)
        if bad is not None:
            counts = {
                r["__reason"]: r["n"]
                for r in bad.groupBy("__reason")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            if counts:
                raise _constraints.CheckViolation(
                    f"batch {commit_key!r} violates declared constraints "
                    f"{counts}; route through pipeline.apply_batch with a "
                    "DLQ to quarantine instead"
                )
            source = clean  # no violators: identical rows, filter pruned

    key = snap.key
    fields = table.schema_fields(snap)
    data_cols = [n for n, _ in fields if n != key]

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

    # The within-batch collapse and the tombstone fence honor the TABLE's
    # declared order column (``sequence.field``) — hardcoding ``lsn``
    # here would collapse a custom-ordered table (CTAS with
    # 'sequence.field') on the wrong column while the read path and
    # agg_bounds fence on the declared one.
    order_col = snap.order_col

    if not precollapsed:
        src = lww_collapse(src, key, order_col, data_cols + [OP_COL])

    batch_rows = src.count() if with_stats else None

    # Delete winners persist as hidden TOMBSTONES rather than being
    # dropped: a late, out-of-order event OLDER than an applied delete
    # must lose the read-time lsn race instead of resurrecting the key
    # (LWW order-independence). Tombstones keep only the fence columns
    # (lsn for the race, warc_ts so retention_sweep can age them out);
    # payload columns null. Readers never see them (table.read filters);
    # compaction purges old ones behind the watermark-coupled fence.
    is_del = F.col(OP_COL) == DELETE_OP
    keep_cols = {order_col, "warc_ts"}
    final = src.select(
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

    new_snap = table.commit_delta(
        final,
        commit_key,
        summary={"batch_rows": batch_rows},
        props_update=props_update,
        stage_id=stage_id,
    )
    return MergeStats(
        commit_key=commit_key,
        applied=True,
        version=new_snap.version,
        touched_buckets=len(new_snap.summary.get("touched", [])),
        batch_rows=batch_rows,
    )
