"""Incrementally-maintained materialized aggregate views over a lake
table's retract-stream changelog.

The view is itself a :class:`LakeTable` keyed on the (string-encoded)
group tuple, so refresh epochs inherit the engine's whole exactly-once
machinery: each epoch commits under an idempotent key derived from the
source-version interval, and a redelivered epoch no-ops on the commit log
BEFORE any delta math runs — aggregate state can never double-count (the
additive-delta analog of the merge path's same-key no-op). The refresh
cursor (last folded source version) rides in the view table's snapshot
properties, committed atomically WITH the epoch's data, so there is no
crash window between "applied" and "cursor advanced".

Reference analog: the reference recomputes collection summaries from full
catalog state on a cron (scripts/aggregate_items.py:42-77); here the
rollup advances by O(changed groups) per epoch instead of O(table).

Scale shape per epoch (what must survive 100 TB):

* ``changelog_rows`` is bucket-pruned to manifests that differ — the
  epoch reads O(delta), not O(source table).
* the ±1-weighted delta aggregate shuffles only (group, weight·value)
  pairs with map-side combine — O(changed groups) and skew-safe, the same
  hash-aggregate shape as the merge path's winner selection.
* current view state is read only for AFFECTED buckets (group-key hash →
  view bucket pruning, a bounded ≤ n_buckets driver-side collect) and
  then semi-joined down to affected groups with the (small) delta
  broadcast — the view table is never fully scanned, let alone rewritten.
* the merged per-group rows land as a normal O(changed groups) delta
  commit; a group whose live count reaches zero is retracted as a real
  delete (tombstoned, so the usual late-event fencing applies).

Only distributive aggregates (count, sum — avg derives at read time) are
self-maintainable under retraction without re-reading the source; min/max
would need a dirty-group recompute pass and are deliberately out of
scope here.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable

_CURSOR_PROP = "mv_source_version"
_ASSERT_OPS = ("insert", "update_postimage")


@dataclass
class AggSpec:
    """One maintained aggregate over a SQL expression of source columns.

    ``count`` (live rows per group) and ``sum`` are self-maintainable
    under retraction by pure ±deltas; for ``sum``, ``ddl`` must be an
    integral type (float retraction drifts).

    ``min``/``max`` are NOT retraction-maintainable in general — dropping
    the stored extremum leaves the runner-up unknown — so they use the
    production pattern: asserts fold in with greatest/least, and an epoch
    retracting a value that TIES-or-beats the stored extremum marks the
    group dirty and re-derives just those groups from the source snapshot
    (Flink's retract-agg fallback / Materialize's reduction hierarchy,
    collapsed to one recompute level). Epochs that never touch an
    extremum pay nothing."""

    name: str
    kind: str  # 'count' | 'sum' | 'min' | 'max'
    expr: str | None = None  # SQL expr over source columns (non-count)
    ddl: str = "bigint"

    def __post_init__(self) -> None:
        if self.kind not in ("count", "sum", "min", "max"):
            raise ValueError(f"unsupported aggregate kind: {self.kind}")
        if self.kind != "count" and not self.expr:
            raise ValueError(f"{self.kind} aggregate needs an expr")


class IncrementalView:
    """A materialized ``GROUP BY`` view kept in sync with its source
    table by folding the source's changelog, epoch by epoch.

    ``group_by`` is a list of ``(name, ddl, sql_expr)`` — the grouping
    columns as SQL expressions over the source schema (e.g. a domain
    extracted from the url). The internal view key is the JSON encoding
    of the group tuple (order-stable, null-safe — unlike ``concat_ws``,
    which conflates NULL with '')."""

    def __init__(
        self,
        spark: SparkSession,
        source: LakeTable,
        root: str,
        group_by: list[tuple[str, str, str]],
        aggs: list[AggSpec],
        n_buckets: int = 16,
        source_columns: list[str] | None = None,
    ):
        self.spark = spark
        self.source = source
        self.group_by = group_by
        self.aggs = aggs
        # columns the group/value expressions need — lets the dirty-group
        # min/max recompute read a pruned source scan (None = all)
        self.source_columns = source_columns
        names = [n for n, _, _ in group_by]
        if len(set(names)) != len(names):
            raise ValueError("duplicate group column names")
        schema: list[tuple[str, str]] = [
            ("__g", "string"),
            ("lsn", "bigint"),
            *[(n, d) for n, d, _ in group_by],
            ("__n_live", "bigint"),
            *[(a.name, a.ddl) for a in aggs],
        ]
        if LakeTable.exists(root):
            self.table = LakeTable(spark, root)
        else:
            self.table = LakeTable.create(
                spark, root, schema, key="__g", n_buckets=n_buckets
            )

    # -- state ------------------------------------------------------------

    def source_version(self) -> int:
        """Last source version folded into the view."""
        return int(self.table.current().props.get(_CURSOR_PROP, 0))

    def read(self) -> DataFrame:
        """Current view contents: group columns + aggregate columns
        (count aggregates read from the maintained live-row counter)."""
        df = self.table.read()
        return df.select(
            *[F.col(n) for n, _, _ in self.group_by],
            *[
                (
                    F.col("__n_live").alias(a.name)
                    if a.kind == "count"
                    else F.col(a.name)
                )
                for a in self.aggs
            ],
        )

    # -- refresh ----------------------------------------------------------

    def refresh(self, max_versions_per_epoch: int | None = None) -> int:
        """Fold source commits newer than the cursor into the view;
        returns the number of epochs applied. ``max_versions_per_epoch``
        bounds how many source commits one epoch spans (backpressure for
        a view resuming after downtime, same contract as
        table_feed.follow_table)."""
        cur = self.source.current().version
        epochs = 0
        v0 = self.source_version()
        while v0 < cur:
            v1 = cur
            if max_versions_per_epoch is not None:
                v1 = min(cur, v0 + max_versions_per_epoch)
            self._apply_epoch(v0, v1)
            v0 = v1
            epochs += 1
        return epochs

    def _group_key(self) -> F.Column:
        return F.to_json(F.struct(*[F.col(n) for n, _, _ in self.group_by]))

    def _apply_epoch(self, v0: int, v1: int) -> None:
        epoch_key = f"mv-{v0}-{v1}"
        if self.table.is_committed(epoch_key):
            # redelivery (crash replay / duplicate trigger): the delta
            # was already folded — touching state again would double-count
            if self.source_version() < v1:
                self.table.update_props({_CURSOR_PROP: v1})
            return
        names = [n for n, _, _ in self.group_by]
        sums = [a for a in self.aggs if a.kind == "sum"]
        exts = [a for a in self.aggs if a.kind in ("min", "max")]

        rows = self.source.changelog_rows(
            v0, v1, columns=self.source_columns
        )
        w = (
            F.when(F.col("op").isin(*_ASSERT_OPS), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("__w")
        )
        val_aggs = []
        for a in exts:
            comb = F.max if a.kind == "max" else F.min
            v = F.col(f"__v_{a.name}")
            val_aggs += [
                # asserted extremum: folds into the stored value
                comb(F.when(F.col("__w") == 1, v)).alias(f"__a_{a.name}"),
                # retracted extremum: decides whether the group is dirty
                comb(F.when(F.col("__w") == -1, v)).alias(f"__r_{a.name}"),
            ]
        delta = (
            rows.select(
                *[F.expr(e).alias(n) for n, _, e in self.group_by],
                w,
                *[
                    F.expr(a.expr).cast(a.ddl).alias(f"__v_{a.name}")
                    for a in sums + exts
                ],
            )
            .groupBy(*names)
            .agg(
                F.sum("__w").cast("bigint").alias("__dn"),
                *[
                    F.sum(F.col("__w") * F.col(f"__v_{a.name}"))
                    .cast(a.ddl)
                    .alias(f"__d_{a.name}")
                    for a in sums
                ],
                *val_aggs,
            )
            .withColumn("__g", self._group_key())
        )
        # the delta feeds bucket discovery AND the merge join — pin it so
        # the changelog diff isn't recomputed per consumer
        delta.persist()
        try:
            if delta.isEmpty():
                # maintenance-only interval (compact/split/vacuum are
                # state-preserving): nothing to fold, just advance the
                # cursor with a metadata-only commit
                self.table.update_props({_CURSOR_PROP: v1})
                return
            snap = self.table.current()
            affected = {
                int(r["b"])
                for r in delta.select(
                    self.table.bucket_expr(snap, key_col="__g").alias("b")
                )
                .distinct()
                .collect()  # bounded: ≤ expanded bucket count
            }
            if affected:
                cur_state = self.table.read(buckets=affected).join(
                    F.broadcast(delta.select("__g")), "__g", "left_semi"
                )
            else:
                cur_state = self.spark.createDataFrame(
                    [], self.table.spark_schema(snap)
                )
            d = delta.select(
                "__g",
                *[F.col(n).alias(f"__dg_{n}") for n in names],
                "__dn",
                *[F.col(f"__d_{a.name}") for a in sums],
                *[
                    c
                    for a in exts
                    for c in (F.col(f"__a_{a.name}"), F.col(f"__r_{a.name}"))
                ],
            )
            m = cur_state.join(d, "__g", "full_outer")
            new_n = F.coalesce(F.col("__n_live"), F.lit(0)) + F.coalesce(
                F.col("__dn"), F.lit(0)
            )
            ext_cols = []
            dirty_flags = []
            for a in exts:
                cur, av, rv = (
                    F.col(a.name),
                    F.col(f"__a_{a.name}"),
                    F.col(f"__r_{a.name}"),
                )
                comb = F.greatest if a.kind == "max" else F.least
                beats = (rv >= cur) if a.kind == "max" else (rv <= cur)
                dirty = cur.isNotNull() & rv.isNotNull() & beats
                dirty_flags.append(dirty.alias(f"__dirty_{a.name}"))
                # greatest/least skip NULLs: new groups take the asserted
                # extremum; assert-free epochs keep the stored one
                ext_cols.append(comb(cur, av).cast(a.ddl).alias(a.name))
            pre = m.select(
                F.col("__g"),
                F.lit(v1).cast("bigint").alias("lsn"),
                *[
                    F.coalesce(F.col(n), F.col(f"__dg_{n}")).alias(n)
                    for n in names
                ],
                new_n.alias("__n_live"),
                *[
                    (
                        F.coalesce(F.col(a.name), F.lit(0))
                        + F.coalesce(F.col(f"__d_{a.name}"), F.lit(0))
                    )
                    .cast(a.ddl)
                    .alias(a.name)
                    for a in sums
                ],
                *ext_cols,
                *[
                    F.lit(None).cast(a.ddl).alias(a.name)
                    for a in self.aggs
                    if a.kind == "count"
                ],
                *dirty_flags,
                F.when(new_n <= 0, "delete").otherwise("upsert").alias("op"),
            )
            batch = self._resolve_dirty(pre, exts, names, v1)
            merge_into(
                self.table,
                batch,
                epoch_key,
                precollapsed=True,
                props_update={_CURSOR_PROP: v1},
            )
        finally:
            delta.unpersist()

    def _resolve_dirty(self, pre, exts, names, v1):
        """Re-derive min/max for groups whose stored extremum may have
        been retracted this epoch: one scan of the SOURCE snapshot at the
        epoch boundary, column-pruned to what the group/value expressions
        need, semi-joined down to the dirty groups (broadcast — the dirty
        set is a subset of this epoch's changed groups). Groups that were
        not dirtied never touch the source."""
        if not exts:
            return pre.drop(*[c for c in pre.columns if c.startswith("__dirty_")])
        flags = [F.col(f"__dirty_{a.name}") for a in exts]
        any_dirty = flags[0]
        for f in flags[1:]:
            any_dirty = any_dirty | f
        dirty = pre.filter(any_dirty & (F.col("op") != "delete")).select(
            "__g", *names
        )
        src = self.source.read(
            snap=self.source.snapshot(v1), columns=self.source_columns
        )
        rec = (
            src.select(
                *[F.expr(e).alias(n) for n, _, e in self.group_by],
                *[
                    F.expr(a.expr).cast(a.ddl).alias(f"__v_{a.name}")
                    for a in exts
                ],
            )
            .join(F.broadcast(dirty.select(*names)), names, "left_semi")
            .groupBy(*names)
            .agg(
                *[
                    (F.max if a.kind == "max" else F.min)(
                        F.col(f"__v_{a.name}")
                    ).alias(f"__t_{a.name}")
                    for a in exts
                ]
            )
            .withColumn("__g", self._group_key())
            .select("__g", *[f"__t_{a.name}" for a in exts])
        )
        out = pre.join(rec, "__g", "left")
        keep = [
            c
            for c in pre.columns
            if not c.startswith("__dirty_") and c not in {a.name for a in exts}
        ]
        return out.select(
            *keep,
            *[
                F.when(
                    F.col(f"__dirty_{a.name}"), F.col(f"__t_{a.name}")
                )
                .otherwise(F.col(a.name))
                .cast(a.ddl)
                .alias(a.name)
                for a in exts
            ],
        )
