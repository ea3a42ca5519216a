"""Conditional-clause MERGE (the Delta/Iceberg ``MERGE INTO`` surface):

    MERGE INTO target t USING source s ON t.<key> = s.<key>
      WHEN MATCHED AND <delete_cond>            THEN DELETE
      WHEN MATCHED AND <update_cond>            THEN UPDATE SET col = expr, ...
      WHEN NOT MATCHED AND <insert_cond>        THEN INSERT *

The engine's core :func:`lake.merge.merge_into` is the CDC special case
(whole-row last-writer-wins, never reads the target). This operator is
the GENERAL merge users write by hand against Delta/Iceberg tables —
clauses see both sides (``s.*`` / ``t.*``), SET expressions may mix them,
and rows matching no clause are untouched. Reference analog: the
conditional re-register path (skip unchanged, replace changed, insert
new) in /root/reference/scripts/register_v1.py:130-155.

Physical strategy (Spark-first):

1. **Target fetch is pruned, not scanned**: the source's distinct keys
   (bounded collect, ``max_point_keys``) drive bloom + bucket pruning via
   ``read(point_keys=)`` — a k-key merge against a 100 TB table opens
   O(files-holding-those-keys). Above the cap it degrades to a
   bucket-pruned read of the touched buckets, then to a full scan —
   always the same answer, progressively less pruning.
2. **Clause evaluation is one declarative join** (source ⟕ state) with
   ``CASE``-shaped column selection — Catalyst sees plain expressions
   (codegen, AQE-broadcastable when the source is small).
3. **The outcome is an EVENT batch, not a table rewrite**: update/delete
   winners feed the ordinary merge-on-read delta commit
   (:func:`merge_into` with ``precollapsed=True``), so conditional MERGE
   composes with time travel, changelog scans, WAP staging, and
   exactly-once commit keys for free, and writes O(touched), never
   O(table).

LWW safety: matched clauses implicitly require ``s.<order> > t.<order>``
— a stale source row (at or below the target's order) matches no clause
and no-ops, which keeps read-time LWW convergent (the emitted event must
win its key's lsn race to take effect).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import (
    DELETE_OP,
    OP_COL,
    MergeStats,
    lww_collapse,
    merge_into,
)
from data_pipeline_spark.lake.table import LakeTable


def merge_when(
    table: LakeTable,
    source: DataFrame,
    commit_key: str,
    matched_update: dict[str, str] | None = None,
    matched_update_cond: str | None = None,
    matched_delete_cond: str | None = None,
    insert_not_matched: bool = True,
    not_matched_cond: str | None = None,
    by_source_delete_cond: str | None = None,
    by_source_update: dict[str, str] | None = None,
    by_source_update_cond: str | None = None,
    by_source_scope: str | None = None,
    max_point_keys: int = 65536,
) -> MergeStats:
    """Apply one conditional MERGE statement and commit the outcome.

    ``source`` carries current-schema columns (missing ones read as
    NULL for inserts) and MUST include the key and order columns; it is
    LWW-collapsed to one row per key first (same-batch duplicates keep
    the newest). Conditions and SET expressions are SQL strings over
    aliases ``s`` (source) and ``t`` (target state).

    Clause precedence mirrors Delta's in-order evaluation with DELETE
    first: matched rows try ``matched_delete_cond``, then
    ``matched_update_cond`` (default: all remaining matched rows when
    ``matched_update`` is given); unmatched rows insert when
    ``insert_not_matched`` (gated by ``not_matched_cond``). SET touches
    only the named columns — every other column keeps the target value.

    The ``WHEN NOT MATCHED BY SOURCE`` family (Delta's snapshot-sync
    clauses) acts on LIVE target rows whose key is absent from the
    source: ``by_source_delete_cond`` deletes them, ``by_source_update``
    rewrites them (DELETE tried first, same precedence). These clauses
    see only ``t.*`` — there is no source row — and the emitted event
    takes order ``t.<order> + 1`` so it wins the read-time LWW race
    against the row it supersedes (a later WAL event at a higher lsn
    still beats it, as it should). Because ANY target row may be
    unmatched, these clauses force a full-table scan; ``by_source_scope``
    (a ``t.*`` predicate, e.g. a domain or bucket slice — the Delta
    best-practice scoping condition) bounds which target rows are
    ELIGIBLE: out-of-scope rows are left untouched, and the predicate
    prunes the scan via file stats where possible.
    """
    snap = table.current()
    if commit_key in snap.commits:
        return MergeStats(commit_key, False, snap.version, 0)
    key, order = snap.key, snap.order_col
    fields = table.schema_fields(snap)
    cols = [n for n, _ in fields]
    data_cols = [n for n in cols if n != key]
    bad = set(matched_update or {}) - set(data_cols)
    if bad:
        raise KeyError(f"matched_update: not updatable columns {sorted(bad)}")
    by_source = (
        by_source_delete_cond is not None or by_source_update is not None
    )
    if by_source:
        bad = set(by_source_update or {}) - set(data_cols)
        if bad:
            raise KeyError(
                f"by_source_update: not updatable columns {sorted(bad)}"
            )
        for what, e in [
            ("by_source_delete_cond", by_source_delete_cond),
            ("by_source_update_cond", by_source_update_cond),
            ("by_source_scope", by_source_scope),
            *[(f"by_source_update[{c}]", e) for c, e in (by_source_update or {}).items()],
        ]:
            if e is not None and re.search(r"\bs\s*\.", e):
                raise ValueError(
                    f"{what}: NOT MATCHED BY SOURCE clauses have no source "
                    f"row — only t.* references are legal (got {e!r})"
                )
    elif by_source_update_cond is not None or by_source_scope is not None:
        raise ValueError(
            "by_source_update_cond / by_source_scope need a BY SOURCE "
            "action clause (by_source_delete_cond or by_source_update)"
        )

    have = set(source.columns)
    if key not in have or order not in have:
        raise KeyError(f"source must carry the key ({key}) and order ({order}) columns")
    # extra source columns ride along for condition/SET evaluation (the
    # Delta shape: `USING (SELECT ..., computed_flag FROM ...)`) but never
    # land in the committed events
    extra = [c for c in source.columns if c not in cols]
    src = source.select(
        *[
            (F.col(n).cast(d) if n in have else F.lit(None).cast(d)).alias(n)
            for n, d in fields
        ],
        *[F.col(c) for c in extra],
    )
    src = lww_collapse(src, key, order, data_cols + extra)

    # Pruned target fetch: point keys under the cap, else touched buckets,
    # else (pathological full-table source) the plain scan. BY SOURCE
    # clauses must see every live row (any key may be absent from the
    # source), so they force the full scan and both joins share it —
    # the bounded key collect is skipped entirely on that path.
    if by_source:
        state = table.read(snap=snap)
    else:
        keys = [
            r[0]
            for r in src.select(key).limit(max_point_keys + 1).collect()
        ]
        if len(keys) <= max_point_keys:
            state = table.read(point_keys=keys, snap=snap)
        else:
            bucket_ids = {
                r["b"]
                for r in src.select(
                    table.bucket_expr(snap, key).alias("b")
                ).distinct().collect()
            }
            state = table.read(
                buckets=bucket_ids if len(bucket_ids) < snap.n_buckets else None,
                snap=snap,
            )

    j = src.alias("s").join(state.alias("t"), on=key, how="left")
    matched = F.col(f"t.{order}").isNotNull() & (
        F.col(f"s.{order}") > F.col(f"t.{order}")
    )
    del_cond = (
        matched & F.expr(matched_delete_cond)
        if matched_delete_cond is not None
        else F.lit(False)
    )
    upd_cond = (
        matched
        & ~del_cond
        & (
            F.expr(matched_update_cond)
            if matched_update_cond is not None
            else F.lit(True)
        )
        if matched_update is not None
        else F.lit(False)
    )
    ins_cond = (
        F.col(f"t.{order}").isNull()
        & (
            F.expr(not_matched_cond)
            if not_matched_cond is not None
            else F.lit(True)
        )
        if insert_not_matched
        else F.lit(False)
    )

    sets = {c: F.expr(e) for c, e in (matched_update or {}).items()}
    # updated rows always advance the order column to the source's (the
    # event must win the read-time lsn race), unless SET overrides it
    sets.setdefault(order, F.col(f"s.{order}"))

    def _out(c: str) -> F.Column:
        upd = sets.get(c, F.col(f"t.{c}"))
        return (
            F.when(del_cond, F.col(f"s.{c}") if c == order else F.col(f"t.{c}"))
            .when(upd_cond, upd)
            .otherwise(F.col(f"s.{c}"))
            .alias(c)
        )

    events = (
        j.filter(del_cond | upd_cond | ins_cond)
        .select(
            F.col(key),
            *[_out(c) for c in data_cols],
            F.when(del_cond, F.lit(DELETE_OP))
            .when(upd_cond, F.lit("update"))
            .otherwise(F.lit("insert"))
            .alias(OP_COL),
        )
    )

    if by_source:
        # Target-only frame: live rows whose key the source lacks (anti
        # join — AQE broadcasts the source key set when it is small).
        # Key-disjoint from `events` by construction, so the union still
        # satisfies merge_into's one-row-per-key precollapsed contract.
        t_only = state.alias("t")
        if by_source_scope is not None:
            t_only = t_only.filter(F.expr(by_source_scope))
        t_only = t_only.join(src.select(key), on=key, how="left_anti")
        bs_del = (
            F.expr(by_source_delete_cond)
            if by_source_delete_cond is not None
            else F.lit(False)
        )
        bs_upd = (
            ~bs_del
            & (
                F.expr(by_source_update_cond)
                if by_source_update_cond is not None
                else F.lit(True)
            )
            if by_source_update is not None
            else F.lit(False)
        )
        bs_sets = {c: F.expr(e) for c, e in (by_source_update or {}).items()}
        # no source row to take the order from: advance past the row this
        # event supersedes so it wins ITS key's read-time LWW race
        # (overridable by an explicit SET, like the matched path)
        bs_sets.setdefault(order, F.col(f"t.{order}") + F.lit(1))
        bumped = F.col(f"t.{order}") + F.lit(1)

        def _bs_out(c: str) -> F.Column:
            # deletes carry the before-image (matched-path parity) with
            # only the order bumped so the tombstone wins its race
            return (
                F.when(bs_del, bumped if c == order else F.col(f"t.{c}"))
                .otherwise(bs_sets.get(c, F.col(f"t.{c}")))
                .alias(c)
            )

        bs_events = (
            t_only.filter(bs_del | bs_upd)
            .select(
                F.col(key),
                *[_bs_out(c) for c in data_cols],
                F.when(bs_del, F.lit(DELETE_OP))
                .otherwise(F.lit("update"))
                .alias(OP_COL),
            )
        )
        events = events.unionByName(bs_events)
    return merge_into(table, events, commit_key, precollapsed=True)
