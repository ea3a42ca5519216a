"""The lake table itself as a change-feed SOURCE: downstream consumers
tail the table's commit log and receive each interval's net row changes —
Iceberg's incremental scan / changelog-table read, closing the CDC loop
(the table that was built FROM a change feed can feed the next table).

Reference analog: downstream catalogs re-sync from the registered
collection rather than the raw source (operator-tools/_migrate_catalog
re-drives targets from catalog state, runner.py:31-54) — here that
re-drive is incremental instead of a full re-list.

Design (scale-first):

* The cursor is a tiny atomically-replaced JSON file (same ``os.replace``
  protocol as the table's ``_CURRENT`` pointer) holding the last DELIVERED
  snapshot version — O(1) state, no log of its own.
* Each epoch delivers ``changes_between(v0, v1)`` — bucket-pruned to
  manifests that differ, so a tail that keeps up reads O(new deltas), not
  O(table) (see LakeTable.changes_between).
* Delivery is at-least-once; **exactly-once composes from the consumer's
  idempotency**: the epoch key is derived from the version interval, so a
  crash between apply and cursor-advance re-delivers the SAME key and an
  idempotent consumer (e.g. a mirror LakeTable keyed on commit_key)
  no-ops — identical to the WAL pipeline's epoch contract
  (streaming/pipeline.py).
* Maintenance commits (compact / split / vacuum) are state-preserving, so
  their intervals produce empty feeds; the cursor still advances past
  them.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import (
    TOMBSTONE_COL,
    LakeTable,
    _atomic_write,
)


def _cursor_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "table_feed_cursor.json")


def read_cursor(checkpoint_dir: str) -> int | None:
    p = _cursor_path(checkpoint_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["version"]


def write_cursor(checkpoint_dir: str, version: int) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    _atomic_write(_cursor_path(checkpoint_dir), json.dumps({"version": version}))


# -- consumer registry (Paimon consumer-id analog) --------------------------
#
# A CONSUMER is a named incremental reader whose delivered position is
# registered IN the source table (one tiny JSON per consumer under
# ``_consumers/``). ``expire_snapshots(respect_consumers=True)`` keeps
# every snapshot at or above the laggiest registered consumer, so a
# reader that falls behind gets incremental diffs on resume instead of
# the full-state resync epoch. The checkpoint cursor stays the
# consumer-side truth; the registration is the table-side retention
# contract. Operational edges: an ABANDONED consumer pins history
# forever — ``drop_consumer`` (or Paimon's expiration-time policy,
# enforced by the caller's maintenance round) releases it.

CONSUMER_DIR = "_consumers"


def _consumer_path(table: LakeTable, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"bad consumer name {name!r}")
    return os.path.join(table.root, CONSUMER_DIR, f"{name}.json")


def register_consumer(table: LakeTable, name: str, version: int) -> None:
    """Record (create or advance) a consumer's delivered position."""
    os.makedirs(os.path.join(table.root, CONSUMER_DIR), exist_ok=True)
    _atomic_write(
        _consumer_path(table, name), json.dumps({"version": int(version)})
    )


def drop_consumer(table: LakeTable, name: str) -> bool:
    """Release a consumer's retention pin. Returns True if it existed."""
    p = _consumer_path(table, name)
    if os.path.exists(p):
        os.remove(p)
        return True
    return False


def consumer_versions(table: LakeTable) -> dict[str, int]:
    d = os.path.join(table.root, CONSUMER_DIR)
    if not os.path.isdir(d):
        return {}
    out = {}
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                out[fn[: -len(".json")]] = int(json.load(f)["version"])
    return out


def follow_table(
    table: LakeTable,
    checkpoint_dir: str,
    apply_fn: Callable[[DataFrame, str], None],
    max_versions_per_epoch: int | None = None,
    start_version: int | None = None,
    consumer: str | None = None,
) -> int:
    """Drain the table's commit log from the checkpointed cursor to the
    current snapshot, delivering one change-feed DataFrame per epoch to
    ``apply_fn(df, epoch_key)``; returns the number of epochs delivered.

    ``max_versions_per_epoch`` bounds how many commits one epoch spans
    (backpressure: a consumer resuming after downtime chews through the
    backlog in bounded bites instead of one giant diff).
    ``start_version`` seeds a fresh cursor (default: the table's oldest
    retained snapshot — a brand-new consumer bootstraps with the full
    state as one "insert" feed from the empty initial snapshot; after
    ``expire_snapshots`` the oldest retained version is the floor).

    Call again later to pick up new commits; each call is one polling
    drain (wrap in the caller's trigger loop / scheduler for continuous
    tailing — the same shape as streaming/pipeline.run_stream epochs).

    ``consumer`` names this reader in the SOURCE table's consumer
    registry: every cursor advance also registers the delivered version
    (:func:`register_consumer`), and ``expire_snapshots(
    respect_consumers=True)`` then refuses to expire the suffix this
    reader still needs — a lagging consumer resumes with incremental
    diffs instead of the full-state resync epoch below.
    """

    def _advance(v: int) -> None:
        write_cursor(checkpoint_dir, v)
        if consumer is not None:
            register_consumer(table, consumer, v)

    cur = table.current().version
    oldest = min(s.version for s in table.snapshot_log())
    v0 = read_cursor(checkpoint_dir)
    if v0 is None:
        v0 = start_version if start_version is not None else oldest
        _advance(v0)
    if v0 < oldest:
        # The cursor points past `expire_snapshots`' horizon — the missed
        # intervals no longer exist as diffs. The LWW table still holds
        # the full CONVERGENCE state (live winners + tombstone fences),
        # so recovery is one resync epoch: current state with tombstones
        # surfaced as deletes. Applied through the same idempotent merge,
        # a lagged mirror converges exactly (unchanged rows re-deliver
        # their own winner — a same-(key,lsn) tie with an identical
        # payload, harmless by construction). The one unrecoverable case
        # is a delete whose tombstone retention ALSO lapsed — the same
        # horizon coupling the merge path already enforces for late
        # events: keep retention ≥ max consumer lag.
        full = table.read(include_tombstones=True)
        feed = full.select(
            F.col(table.current().key),
            F.when(F.col(TOMBSTONE_COL), "delete")
            .otherwise("insert")
            .alias("op"),
            *[
                c
                for c in full.columns
                if c not in (table.current().key, TOMBSTONE_COL)
            ],
        )
        apply_fn(feed, f"table-feed-resync-{v0}-{cur}")
        _advance(cur)
        return 1
    epochs = 0
    while v0 < cur:
        v1 = cur
        if max_versions_per_epoch is not None:
            v1 = min(cur, v0 + max_versions_per_epoch)
        feed = table.changes_between(v0, v1)
        if not feed.isEmpty():
            apply_fn(feed, f"table-feed-{v0}-{v1}")
        _advance(v1)
        v0 = v1
        epochs += 1
    return epochs


def mirror_to(
    source: LakeTable,
    mirror: LakeTable,
    checkpoint_dir: str,
    max_versions_per_epoch: int | None = None,
) -> int:
    """Incrementally replicate ``source`` into ``mirror`` (downstream
    sync): each feed epoch is applied as a normal idempotent merge batch,
    so replicas inherit the engine's whole exactly-once machinery — a
    re-delivered epoch key is a no-op on the mirror's commit log.

    The feed's delete rows carry the last live payload with op='delete';
    the apply path turns them into mirror tombstones. Extraction re-runs
    on the mirror, which is byte-identical by the frozen extractor
    contract (extraction.py EXTRACTOR_VERSION).

    **Schema evolution propagates**: each epoch's feed is aligned to the
    interval-end snapshot's schema (changes_between contract), so before
    applying, any columns the mirror lacks (or holds narrower) are added
    / widened via an idempotent metadata-only evolve commit keyed off the
    epoch — the mirror crosses the source's add-column boundary exactly
    one epoch after the source does."""
    from data_pipeline_spark.pipeline import apply_batch

    def _sync_schema(src_snap) -> None:
        want = source.schema_fields(src_snap)
        have = dict(mirror.schema_fields(mirror.current()))
        add = {n: d for n, d in want if n not in have}
        widen = {n: d for n, d in want if n in have and have[n] != d}
        if add or widen:
            # keyed on the SOURCE schema version: replays and later
            # epochs seeing the same evolution all no-op
            mirror.evolve_schema(
                add_columns=add or None,
                widen=widen or None,
                commit_key=f"table-feed-evolve-{src_snap.schema_version}",
            )

    def _apply(df: DataFrame, epoch_key: str) -> None:
        # epoch key format "table-feed-{v0}-{v1}" (follow_table contract)
        v1 = int(epoch_key.rsplit("-", 1)[1])
        _sync_schema(source.snapshot(v1))
        apply_batch(mirror, df, epoch_key, record_metrics=False)

    epochs = follow_table(
        source,
        checkpoint_dir,
        _apply,
        max_versions_per_epoch=max_versions_per_epoch,
    )
    # schema parity even when the post-evolution data hasn't arrived yet
    # (an evolve commit alone produces an empty feed, skipping _apply)
    _sync_schema(source.snapshot(read_cursor(checkpoint_dir)))
    return epochs
