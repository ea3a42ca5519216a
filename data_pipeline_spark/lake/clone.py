"""Zero-copy shallow clone (Delta SHALLOW CLONE / Iceberg snapshot-ref
export analog).

``clone_table`` creates a NEW table whose manifests reference the source
snapshot's data files by ABSOLUTE path — no data moves; the clone costs
O(n_buckets) manifest writes. Every read-path join in the engine uses
``os.path.join(root, path)``, which passes absolute paths through
unchanged, so clones read, merge, compact, evolve, and branch with the
unmodified machinery. Writes after the clone land under the clone's own
root as ordinary relative-path commits; the source never changes.

Independence properties (tested):

* The clone's ``vacuum`` walks only the clone's local data dir —
  source files are never deletion candidates.
* ``compact`` rewrites buckets into local files, so a full compaction
  MATERIALIZES the clone (no absolute references remain; the source can
  then be deleted).
* The source snapshot's commit keys carry over: replaying the same WAL
  against the clone stays exactly-once across the clone boundary.

Documented hazard (same as Delta shallow clones): the SOURCE's vacuum /
expire does not know about clones. Vacuuming the source can delete files
a live clone still references — materialize (compact) the clone first,
or keep the source's snapshots alive for the clone's lifetime.

Reference analog: the catalog-migration tool re-registers existing
objects under a new catalog without copying them
(operator-tools/_migrate_catalog/runner.py:31-54).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from data_pipeline_spark.lake.table import (
    DATA_DIR,
    MANIFEST_DIR,
    SNAPSHOT_DIR,
    LakeTable,
    Snapshot,
)


def clone_table(
    source: LakeTable, dest_root: str, spark: SparkSession | None = None
) -> LakeTable:
    """Shallow-clone ``source``'s current snapshot into ``dest_root``."""
    if LakeTable.exists(dest_root):
        raise ValueError(f"{dest_root} already holds a table")
    spark = spark or source.spark
    snap = source.current()
    os.makedirs(os.path.join(dest_root, SNAPSHOT_DIR), exist_ok=True)
    os.makedirs(os.path.join(dest_root, MANIFEST_DIR), exist_ok=True)
    os.makedirs(os.path.join(dest_root, DATA_DIR), exist_ok=True)
    clone = LakeTable(spark, dest_root)
    manifests: dict[str, list[str]] = {}
    for b in snap.manifests:
        entries = [
            {**e, "path": os.path.join(source.root, e["path"])}
            for e in source.bucket_entries(snap, b)
        ]
        manifests[str(b)] = (
            [clone._write_manifest(0, int(b), entries)] if entries else []
        )
    new = Snapshot(
        version=0,
        schema_version=snap.schema_version,
        schemas=snap.schemas,
        n_buckets=snap.n_buckets,
        key=snap.key,
        manifests=manifests,
        commits=dict(snap.commits),
        summary={
            "op": "clone",
            "source": source.root,
            "source_version": snap.version,
        },
        order_col=snap.order_col,
        props=dict(snap.props),
        depths=dict(snap.depths),
    )
    clone._write_snapshot(new, expect_parent=None)
    return clone


def external_refs(table: LakeTable) -> list[str]:
    """Absolute (out-of-root) data paths the current snapshot still
    references — empty once the clone is materialized (compacted)."""
    snap = table.current()
    out = []
    for b in snap.manifests:
        for e in table.bucket_entries(snap, b):
            if os.path.isabs(e["path"]):
                out.append(e["path"])
    return sorted(out)
