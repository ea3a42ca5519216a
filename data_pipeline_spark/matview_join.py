"""Incrementally-maintained JOIN view (fact ⋈ dim), delta-scoped.

``matview.IncrementalView`` keeps GROUP-BY rollups in sync by folding the
retract stream; this module does the same for the other big derived-table
shape: an enrichment join of a url-keyed fact table against a
dimension table (domain metadata, crawl policies, site ownership). The
view is itself a lake table keyed by the FACT key — each fact row joins
at most one dim row (equi-join on a computed fact-side expression vs the
dim's primary key), so view rows have stable identity and the whole
machinery (merge-on-read, idempotent epochs, time travel) applies.

Maintenance is **delta-scoped recompute**: a view row depends only on
(current fact row, current dim row for its join value), so per epoch it
suffices to recompute exactly the fact keys whose inputs changed —

* ΔF: keys in ``fact.changes_between(fv0, fv1)`` (bucket-pruned diff),
* ΔD: fact keys whose join value appears in
  ``dim.changes_between(dv0, dv1)`` — found with ONE narrow fact scan
  (key + join-expr columns only) semi-joined against the broadcast set
  of changed dim keys; dim changes are the rare direction, and at 100 TB
  a join-value secondary index (index.SecondaryIndex) replaces the scan.

Affected keys are re-read through the fact table's bloom/bucket-pruned
point-lookup path when few (``max_point_keys``), a semi-join scan when
many — the same selectivity routing as ``index.SecondaryIndex.lookup``.
The recomputed rows MERGE into the view fenced at ``fv1 + dv1`` (strictly
increasing per epoch: at least one cursor advanced), with deletes for
affected keys that no longer produce a row (fact deleted; or inner join
and the dim row vanished). Both cursors ride in the view commit's props
— a crash between "view merged" and "cursor advanced" replays
idempotently off the epoch commit key.

Equivalence argument (test-pinned): after refresh, every key whose fact
or dim input changed since the last epoch has been recomputed from
CURRENT states, and unchanged keys' view rows were already equal to the
from-scratch join — so view == fact ⋈ dim at (fv1, dv1), always.

Reference analog: the catalog's items are enriched with per-collection
metadata resolved at registration time and re-resolved when collections
change (/root/reference/scripts/register_v1.py:130-155); the join view
is that enrichment kept continuously consistent by O(delta) work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable

_FACT_CURSOR = "jv_fact_cursor"
_DIM_CURSOR = "jv_dim_cursor"


class JoinView:
    def __init__(
        self,
        spark: SparkSession,
        fact: LakeTable,
        dim: LakeTable,
        root: str,
        join_expr: str,
        fact_cols: list[tuple[str, str, str]],
        dim_cols: list[str],
        how: str = "inner",
        n_buckets: int = 16,
        join_expr_cols: list[str] | None = None,
    ):
        """``join_expr`` — SQL over the fact schema producing the dim key.
        ``fact_cols`` — (name, ddl, sql_expr) projections of the fact row.
        ``dim_cols`` — dim payload columns copied through (source types).
        ``join_expr_cols`` — fact columns the join expression reads (lets
        the ΔD-affected scan prune to key + these; None = all)."""
        if how not in ("inner", "left"):
            raise ValueError(f"how must be inner|left, got {how!r}")
        self.spark = spark
        self.fact = fact
        self.dim = dim
        self.join_expr = join_expr
        self.fact_cols = fact_cols
        self.dim_cols = dim_cols
        self.how = how
        self.join_expr_cols = join_expr_cols
        dim_fields = dict(dim.schema_fields(dim.current()))
        missing = [c for c in dim_cols if c not in dim_fields]
        if missing:
            raise ValueError(f"dim has no columns {missing}")
        names = [n for n, _, _ in fact_cols]
        if len(set(names + dim_cols)) != len(names) + len(dim_cols):
            raise ValueError("duplicate view column names")
        self._fact_key = fact.current().key
        self._dim_key = dim.current().key
        schema = [
            (self._fact_key, "string"),
            ("lsn", "bigint"),
            ("__jk", dim_fields[self._dim_key]),
            *[(n, d) for n, d, _ in fact_cols],
            *[(c, dim_fields[c]) for c in dim_cols],
        ]
        if LakeTable.exists(root):
            self.table = LakeTable(spark, root)
        else:
            self.table = LakeTable.create(
                spark, root, schema, key=self._fact_key, n_buckets=n_buckets
            )

    # -- state ----------------------------------------------------------------

    def cursors(self) -> tuple[int, int]:
        p = self.table.current().props
        return int(p.get(_FACT_CURSOR, 0)), int(p.get(_DIM_CURSOR, 0))

    def read(self) -> DataFrame:
        return self.table.read().select(
            self._fact_key,
            *[n for n, _, _ in self.fact_cols],
            *self.dim_cols,
        )

    # -- refresh ----------------------------------------------------------------

    def _affected_keys(self, fv0, fv1, dv0, dv1) -> DataFrame:
        k = self._fact_key
        parts: list[DataFrame] = []
        if fv1 > fv0:
            parts.append(self.fact.changes_between(fv0, fv1).select(k))
        if dv1 > dv0:
            dkeys = (
                self.dim.changes_between(dv0, dv1)
                .select(F.col(self._dim_key).alias("__jk"))
                .distinct()
            )
            cols = (
                [k] + self.join_expr_cols
                if self.join_expr_cols is not None
                else None
            )
            scan = self.fact.read(columns=cols).select(
                F.col(k), F.expr(self.join_expr).alias("__jk")
            )
            parts.append(
                scan.join(F.broadcast(dkeys), "__jk", "left_semi").select(k)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()

    def refresh(self, max_point_keys: int = 1024) -> tuple[int, int]:
        """One maintenance epoch: recompute every fact key whose fact or
        dim input changed since the stored cursors; returns the new
        cursors. Idempotent under replay (epoch commit key)."""
        fv0, dv0 = self.cursors()
        fv1 = self.fact.current().version
        dv1 = self.dim.current().version
        if fv1 <= fv0 and dv1 <= dv0:
            return fv0, dv0
        k = self._fact_key
        affected = self._affected_keys(fv0, fv1, dv0, dv1)

        n = affected.count()
        if n == 0:
            rows = None
        else:
            if n <= max_point_keys:
                keys = [r[0] for r in affected.collect()]
                cur = self.fact.lookup(keys)
            else:
                cur = self.fact.read().join(affected, k, "left_semi")
            cur = cur.select(
                F.col(k),
                F.expr(self.join_expr).alias("__jk"),
                *[F.expr(e).alias(n_) for n_, _, e in self.fact_cols],
            )
            dimdf = self.dim.read(
                columns=[self._dim_key] + self.dim_cols
            ).withColumnRenamed(self._dim_key, "__jk")
            joined = cur.join(dimdf, "__jk", self.how)
            fence = F.lit(fv1 + dv1).cast("bigint")
            ups = joined.select(
                F.col(k),
                fence.alias("lsn"),
                "__jk",
                *[n_ for n_, _, _ in self.fact_cols],
                *self.dim_cols,
                F.lit("update").alias("op"),
            )
            dels = (
                affected.join(joined.select(k), k, "left_anti")
                .select(F.col(k), fence.alias("lsn"), F.lit("delete").alias("op"))
            )
            rows = ups.unionByName(dels, allowMissingColumns=True)

        commit_key = f"jv-{fv0}.{dv0}-{fv1}.{dv1}"
        props = {_FACT_CURSOR: fv1, _DIM_CURSOR: dv1}
        if rows is None:
            # nothing affected (e.g. dim churn on values no fact uses):
            # still advance the cursors atomically, idempotently.
            self.table.update_props(props)
        else:
            merge_into(
                self.table, rows, commit_key=commit_key, props_update=props
            )
        return fv1, dv1
