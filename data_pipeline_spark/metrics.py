"""Sidecar metrics table: per-commit + per-partition (bucket) lineage.

Reference behavior: every pipeline run appends one JSONL audit record per
item plus a run summary with a reconciliation invariant
(reference: scripts/cleanup_expired_items.py:110-127,302-317;
operator-tools/_migrate_catalog/migrations/stamp_expires.py:78-142 asserts
``stamped == modified + failed``). Here the analog is an append-only parquet
sidecar next to the lake table:

* ``commits``  — one row per commit: key, version, rows, wall ms, extractor
  version (the pinned-writer lesson, scripts/s1_store_meta.py:1-38).
* ``lineage``  — one row per (commit, bucket): count/rows/bytes of the
  files ADDED by that commit — read from parquet footers, no Spark job,
  O(added files) per commit (a state-level census would be O(table) under
  merge-on-read and is what the ``files()`` metadata table is for).

Reconciliation invariant carried over: between compactions, per bucket,
``sum(lineage.rows over commits) == physical rows in the bucket``; a
compaction commit's lineage row restarts the sum (its added files ARE the
bucket content).
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from data_pipeline_spark.extraction import EXTRACTOR_VERSION
from data_pipeline_spark.lake.table import LakeTable, Snapshot

METRICS_DIR = "_metrics"


def _append(root: str, sub: str, table: pa.Table) -> None:
    d = os.path.join(root, METRICS_DIR, sub)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, f"{uuid.uuid4().hex}.parquet"))


def record_commit(
    table: LakeTable,
    snap: Snapshot,
    commit_key: str,
    wall_ms: float,
    batch_rows: int | None,
    flow: dict[str, int] | None = None,
) -> None:
    """``flow`` carries the per-epoch event-flow counters
    (events_read/applied/deduped/late_dropped/quarantined/deletes) whose
    reconciliation invariant is ``read == applied + deduped +
    late_dropped + quarantined`` — late_dropped is 0 unless a watermark
    is configured, quarantined is 0 unless a dead-letter table is wired
    (reference: stamp_expires.report, stamped == modified + failed)."""
    added: dict[str, list[str]] = snap.summary.get("added", {})
    lineage_rows: list[dict] = []
    for b, paths in sorted(added.items(), key=lambda kv: int(kv[0])):
        rows = 0
        bytes_ = 0
        for rel in paths:
            p = os.path.join(table.root, rel)
            rows += pq.read_metadata(p).num_rows
            bytes_ += os.path.getsize(p)
        lineage_rows.append(
            {
                "commit_key": commit_key,
                "version": snap.version,
                "bucket": int(b),
                "files": len(paths),
                "rows": rows,
                "bytes": bytes_,
            }
        )
    if lineage_rows:
        _append(table.root, "lineage", pa.Table.from_pylist(lineage_rows))
    _append(
        table.root,
        "commits",
        pa.Table.from_pylist(
            [
                {
                    "commit_key": commit_key,
                    "version": snap.version,
                    "ts_unix_ms": int(time.time() * 1000),
                    "wall_ms": float(wall_ms),
                    "batch_rows": batch_rows,
                    "touched_buckets": len(added),
                    "extractor_version": EXTRACTOR_VERSION,
                    "events_read": (flow or {}).get("events_read"),
                    "events_applied": (flow or {}).get("events_applied"),
                    "events_deduped": (flow or {}).get("events_deduped"),
                    "events_late_dropped": (flow or {}).get(
                        "events_late_dropped"
                    ),
                    "events_quarantined": (flow or {}).get(
                        "events_quarantined"
                    ),
                    "deletes": (flow or {}).get("deletes"),
                }
            ]
        ),
    )


def read_metrics(table: LakeTable, sub: str = "commits"):
    """Metrics as a Spark DataFrame (for queries / assertions)."""
    d = os.path.join(table.root, METRICS_DIR, sub)
    return table.spark.read.parquet(d)


# ---------------------------------------------------------------------------
# K7: aggregation publish with replace-by-rel link update
# ---------------------------------------------------------------------------

AGGREGATES_DIR = "_aggregates"


def publish_aggregate(table: LakeTable, agg_df, rel: str, commit_key: str):
    """K7 aggregation publish (reference: scripts/aggregate_items.py:121-199 —
    aggregation blobs uploaded to S3, then the collection's link with the
    same ``rel`` is REPLACED to point at the new blob).

    Spark analog: write the aggregate DataFrame to an immutable
    ``_aggregates/<rel>/<commit_key>/`` parquet directory, then atomically
    swap the links document so ``rel`` points at the new publish. Readers
    always follow the link — a half-written parquet dir is unreachable until
    the link lands (same write-then-swap discipline as table snapshots).
    Idempotent on ``commit_key``: a re-publish of a recorded key is a no-op
    (the crash-redelivery contract all sinks here share).

    Returns the link record now active for ``rel``."""
    import json
    import tempfile

    links_path = os.path.join(table.root, AGGREGATES_DIR, "links.json")
    links: dict[str, dict] = {}
    if os.path.exists(links_path):
        with open(links_path) as f:
            links = json.load(f)
    prev = links.get(rel)
    if prev is not None and prev["commit_key"] == commit_key:
        return prev  # idempotent re-publish
    rel_dir = os.path.join(AGGREGATES_DIR, rel, commit_key)
    out = os.path.join(table.root, rel_dir)
    agg_df.write.mode("overwrite").parquet(out)
    n_rows = sum(
        pq.read_metadata(os.path.join(out, f)).num_rows
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    links[rel] = {
        "rel": rel,
        "path": rel_dir,
        "commit_key": commit_key,
        "rows": n_rows,
        "published_unix_ms": int(time.time() * 1000),
        "replaced": None if prev is None else prev["commit_key"],
    }
    os.makedirs(os.path.dirname(links_path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(links_path))
    with os.fdopen(fd, "w") as f:
        json.dump(links, f, indent=1)
    os.replace(tmp, links_path)  # atomic link swap (replace-by-rel)
    return links[rel]


def read_aggregate(table: LakeTable, rel: str):
    """Follow the ``rel`` link to the currently-published aggregate."""
    import json

    links_path = os.path.join(table.root, AGGREGATES_DIR, "links.json")
    with open(links_path) as f:
        link = json.load(f)[rel]
    return table.spark.read.parquet(os.path.join(table.root, link["path"]))
