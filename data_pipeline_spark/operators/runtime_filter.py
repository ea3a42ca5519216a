"""Runtime-filter join: dim-driven file pruning before a fact-table join.

The Iceberg/Spark "runtime filtering" (and dynamic-partition-pruning)
shape: when a lake table joins a SELECTIVE dimension, the dim side's
join-key set is known before the fact scan runs — so push it INTO the
scan plan and open only the files that can match, instead of scanning
100 TB to throw 99.9% of rows away at the join. Reference analog: the
per-item id list driving bounded catalog fetches instead of full-catalog
scans (reference: scripts/query_stac.py:152-182,
operator-tools/_migrate_catalog/runner.py:31-54).

Two pruning paths, chosen by what the join column is:

* **key path** (``on`` == the table key): the dim's distinct keys route
  to buckets and probe manifest key-blooms (:meth:`LakeTable.lookup`) —
  a k-key join opens O(files-holding-those-keys), the point-lookup
  economics applied to a join.
* **stats path** (any other column): the dim's [min, max] interval
  prunes via manifest column stats (:meth:`LakeTable.read` with
  ``stats_bounds``) — effective after a z-order ``compact`` clustered
  that column; always sound (exact post-collapse filter either way).

Both paths cap driver-side state: the key path collects at most
``max_keys + 1`` DISTINCT keys (one ``limit`` job), and above the cap —
or for join types where pruning is unsound — falls back to the plain
declarative join and lets Catalyst/AQE pick the strategy. The dim side
is NOT forcibly broadcast: AQE sees its true size at runtime.

Pruning is sound only for join types that cannot RESURRECT unmatched
fact rows: inner and left-semi (and left-anti against the pruned
complement is NOT expressible this way — a pruned-away file still holds
anti-join survivors, so anti falls back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable

PRUNABLE_JOINS = {"inner", "left_semi", "leftsemi", "semi"}


def runtime_filtered_join(
    table: LakeTable,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    max_keys: int = 65536,
    columns: list[str] | None = None,
) -> DataFrame:
    """Join the lake table's current state with ``dim`` on column ``on``,
    pruning the table scan by the dim's runtime key set first.

    Returns the joined DataFrame (for ``left_semi``, the pruned fact rows
    alone). Falls back to the unpruned declarative join when the key set
    exceeds ``max_keys`` or the join type cannot prune soundly.
    """
    snap = table.current()
    norm = how.replace("_", "").lower()
    if norm not in {j.replace("_", "") for j in PRUNABLE_JOINS}:
        return table.read(columns=columns).join(dim, on=on, how=how)

    if on == snap.key:
        # One bounded job: distinct keys, capped at max_keys + 1 so the
        # driver never holds an unbounded collect.
        keys = [
            r[0]
            for r in dim.select(on).distinct().limit(max_keys + 1).collect()
            if r[0] is not None
        ]
        if len(keys) > max_keys:
            fact = table.read(columns=columns)
        else:
            fact = table.lookup(keys)
            if columns:
                fact = fact.select(*columns)
    else:
        # Interval runtime filter: two scalars, always bounded. The exact
        # predicate re-applies post-collapse inside read(); file skipping
        # engages wherever manifest stats cover the column.
        lo, hi = dim.agg(F.min(on), F.max(on)).first()
        if lo is None:
            fact = table.read(columns=columns)
        else:
            fact = table.read(stats_bounds={on: (lo, hi)}, columns=columns)

    if norm in {"leftsemi", "semi"}:
        return fact.join(dim.select(on).distinct(), on=on, how="left_semi")
    return fact.join(dim, on=on, how="inner")


def planned_file_count(
    table: LakeTable, dim: DataFrame, on: str, max_keys: int = 65536
) -> tuple[int, int]:
    """(pruned, total) data-file counts for a prospective runtime-filter
    join — the observability hook tests and ops dashboards use."""
    snap = table.current()
    total = sum(len(v) for v in table._select_files(snap)[0].values())
    if on == snap.key:
        keys = [
            r[0]
            for r in dim.select(on).distinct().limit(max_keys + 1).collect()
            if r[0] is not None
        ]
        if len(keys) > max_keys:
            return total, total
        bs = {
            int(r["b"])
            for r in table.spark.createDataFrame(
                [(k,) for k in keys], f"{snap.key} string"
            )
            .select(table.bucket_expr(snap).alias("b"))
            .distinct()
            .collect()
        }
        groups, _ = table._select_files(snap, buckets=bs, point_keys=keys)
    else:
        lo, hi = dim.agg(F.min(on), F.max(on)).first()
        if lo is None:
            return total, total
        groups, _ = table._select_files(snap, stats_bounds={on: (lo, hi)})
    return sum(len(v) for v in groups.values()), total
