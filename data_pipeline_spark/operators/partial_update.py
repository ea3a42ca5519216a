"""Partial-update merge mode: patch events carry only the columns they
change (others NULL); the current row per key is the per-column latest
non-null value, with deletes resetting the row.

The CDC shapes this serves are Debezium/Maxwell "patch" payloads and
multi-source column stitching (two feeds each owning a column subset of
one entity), the merge engine Paimon calls partial-update — expressed
here as ONE hash aggregate (single shuffle of the patch rows, map-side
combined), not a per-column join cascade:

  per key, in one groupBy().agg():
    __tdel      = max(order) over delete events          (reset fence)
    __tlive     = max(order) over non-delete events      (row liveness)
    __p_<col>   = max_by((order, value), (order, fp))    per column,
                  over non-delete events where the column is non-NULL

  then row exists iff __tlive > __tdel, and a column's value survives
  only if its winning patch is NEWER than the reset fence (a delete
  must not leak pre-delete column values into the post-delete row).

Determinism: rows tied on the order column (a feed contract violation,
same stance as lake/merge.lww_collapse) tie-break per column by xxhash64
of the value, so every run converges on the same row regardless of input
order or partitioning.

Storage note: patch tables append every patch (each (key, order) is a
distinct physical row — LakeTable.commit_delta / raw reads), because the
whole-row LWW collapse would fold patches of one key into only the
newest. Do not run LWW compaction on a patch table; fold it through this
collapse instead (the test pins the round trip).

Reference analog: the storage-tier patcher updates ONLY the tier fields
of an item's properties and leaves the rest of the document alone
(scripts/update_stac_storage_tier.py:104-145, update_item_storage_tiers),
while the ingest path re-registers whole documents
(run_ingest_register.py:67-161) — this operator is the lake-side form of
that distinction: 100 TB of rows are NOT rewritten when one column moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Sentinel older than any real LSN: a key with no delete event gets a
# reset fence every patch beats.
_NEG_INF = -(1 << 62)


def partial_update_collapse(
    df: DataFrame,
    key: str,
    order: str,
    cols: list[str],
    op_col: str = "op",
    delete_value: str = "delete",
) -> DataFrame:
    """Collapse a patch-event frame to current rows (one per live key).

    ``cols`` are the patchable payload columns; the output carries
    ``key``, ``order`` (the key's latest live event), and each payload
    column at its latest non-null patch since the last delete.
    """
    deleted = F.col(op_col) == delete_value
    aggs = [
        F.max(F.when(deleted, F.col(order))).alias("__tdel"),
        F.max(F.when(~deleted, F.col(order))).alias("__tlive"),
    ]
    for c in cols:
        aggs.append(
            F.max_by(
                F.struct(F.col(order).alias("o"), F.col(c).alias("v")),
                # NULL ordering rows are ignored by max_by — exactly the
                # per-column FILTER we need, with the xxhash64 value
                # fingerprint breaking order-ties deterministically.
                F.when(
                    ~deleted & F.col(c).isNotNull(),
                    F.struct(
                        F.col(order).alias("o"), F.xxhash64(c).alias("f")
                    ),
                ),
            ).alias(f"__p_{c}")
        )
    g = df.groupBy(key).agg(*aggs)
    tdel = F.coalesce(F.col("__tdel"), F.lit(_NEG_INF).cast("bigint"))
    live = g.filter(F.col("__tlive").isNotNull() & (F.col("__tlive") > tdel))
    out_cols = [F.col(key), F.col("__tlive").alias(order)]
    for c in cols:
        out_cols.append(
            F.when(F.col(f"__p_{c}.o") > tdel, F.col(f"__p_{c}.v")).alias(c)
        )
    return live.select(*out_cols)


def sequence_group_collapse(
    df: DataFrame,
    key: str,
    order: str,
    seq_groups: dict[str, list[str]],
    op_col: str = "op",
    delete_value: str = "delete",
) -> DataFrame:
    """Partial update with per-group sequence columns (the Paimon
    ``fields.<seq>.sequence-group`` merge engine): each column GROUP is
    owned by its own sequence column — the multi-source stitching shape
    where feed A versions (html, warc_ts) by its own offset while feed B
    versions (lang) by another, and neither feed may regress the other's
    columns no matter how their events interleave on the default order.

    Semantics per key:
      - liveness and the delete fence ride the DEFAULT ``order`` column
        (a delete resets every group);
      - among events newer than the fence, each group takes ALL its
        columns atomically from the event with the greatest non-null
        group sequence (ties broken by xxhash64 of the group's values,
        same determinism stance as partial_update_collapse);
      - a group with no post-fence non-null sequence reads NULL.

    Plan: one narrow aggregate over delete events only (the fence frame
    holds keys-with-deletes, usually a small fraction), joined back on
    the key — Catalyst co-partitions it with the collapse groupBy that
    follows, so the fence join adds no extra shuffle of the patch rows
    beyond the one the collapse itself needs — then ONE hash aggregate
    with a max_by per group. Two-dimensional ordering (group seq vs the
    fence's order) is why this cannot reuse the single-aggregate
    partial_update_collapse trick: a group winner chosen by seq may sit
    below a fence that a lower-seq live patch clears, so the fence must
    be applied BEFORE winner selection.
    """
    deleted = F.col(op_col) == delete_value
    fences = df.filter(deleted).groupBy(key).agg(
        F.max(order).alias("__tdel")
    )
    live = (
        df.filter(~deleted)
        .join(fences, key, "left")
        .filter(
            F.col(order)
            > F.coalesce(F.col("__tdel"), F.lit(_NEG_INF).cast("bigint"))
        )
    )
    aggs = [F.max(order).alias("__tlive")]
    for seq, cols in seq_groups.items():
        aggs.append(
            F.max_by(
                F.struct(
                    F.col(seq).alias("s"),
                    *[F.col(c).alias(c) for c in cols],
                ),
                F.when(
                    F.col(seq).isNotNull(),
                    F.struct(
                        F.col(seq).alias("s"),
                        F.xxhash64(*cols).alias("f"),
                    ),
                ),
            ).alias(f"__g_{seq}")
        )
    g = live.groupBy(key).agg(*aggs)
    out_cols = [F.col(key), F.col("__tlive").alias(order)]
    for seq, cols in seq_groups.items():
        out_cols.append(F.col(f"__g_{seq}.s").alias(seq))
        out_cols.extend(F.col(f"__g_{seq}.{c}").alias(c) for c in cols)
    return g.select(*out_cols)


def fold_events(
    df: DataFrame,
    key: str,
    order: str,
    cols: list[str],
    op_col: str = "op",
    delete_value: str = "delete",
) -> DataFrame:
    """Fold a patch-event frame into EVENT-SHAPED rows that reproduce the
    same collapse — the compaction kernel for patch tables (Paimon: the
    merge engine runs at compaction too).

    The stitched row per live key becomes one ``insert`` event at the
    key's latest live order. This is exact for any future refold as long
    as every later event's order is GREATER than the fold horizon (the
    caller's watermark contract): re-stamping a column's winner from its
    original patch order up to ``tlive`` cannot change any outcome,
    because a newer patch still beats it and a newer delete still kills
    it; keys dead at fold time vanish, exactly as the unfolded fence
    would erase their pre-delete columns. Deletes themselves fold away —
    their only effect below the horizon is already applied.
    """
    cur = partial_update_collapse(
        df, key, order, cols, op_col=op_col, delete_value=delete_value
    )
    return cur.select(
        F.col(key),
        F.col(order),
        F.lit("insert").alias(op_col),
        *[F.col(c) for c in cols],
    )
