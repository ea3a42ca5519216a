"""Multi-table transactions: all-or-nothing publication across lake
tables, composed from write-audit-publish staged commits plus a durable
transaction manifest (the catalog-level multi-table commit a Nessie-style
service provides, collapsed to the same atomic-file primitives the
tables already use).

Reference analog: the reference's convert-and-register step must keep
the object store and the catalog row in step and re-drives the catalog
from storage when they diverge (operator-tools/_migrate_catalog/
runner.py:31-54); here the divergence window is closed by construction
for any set of lake tables — e.g. a CDC table and its metrics sidecar,
or a source table and a derived mirror.

Protocol (presumes the engine's single-writer-per-table model):

1. ``stage(table, df, commit_key)`` — each participant's batch is fully
   written as a WAP staged commit (data + manifests + parked snapshot);
   nothing is visible anywhere.
2. ``commit()`` — the transaction manifest (participants + stage ids) is
   atomically written in state ``committing``: this is the COMMIT POINT.
   Then each staged commit is published in order and the manifest is
   marked ``committed``.
3. Crash recovery (:func:`recover_transactions`):
   * crash BEFORE the manifest write → nothing was published anywhere;
     the orphaned staged commits are aborted (files vacuum-reclaimed).
   * crash AFTER the manifest write → the transaction is decided:
     recovery re-publishes every participant whose staged snapshot still
     exists (an already-published one is gone — publish is idempotent at
     the protocol level) and marks the manifest ``committed``.

What this gives and does not give: atomic DURABILITY — after recovery,
either every table shows its commit or none does. It does not give
cross-table snapshot isolation mid-publish (a reader racing the publish
loop can see table A's commit before table B's — the same window a
catalog-less Iceberg multi-table commit has); per-table reads stay
snapshot-consistent as always.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_spark.lake.merge import MergeStats, merge_into
from data_pipeline_spark.lake.table import LakeTable, _atomic_write

_STATE_COMMITTING = "committing"
_STATE_COMMITTED = "committed"


class MultiTableTransaction:
    def __init__(self, txn_dir: str, txn_id: str | None = None):
        self.txn_dir = txn_dir
        self.txn_id = txn_id or uuid.uuid4().hex[:12]
        # (table, stage_id, commit_key) per participant
        self._parts: list[tuple[LakeTable, str, str]] = []
        self._done = False

    def _manifest_path(self) -> str:
        return os.path.join(self.txn_dir, f"txn-{self.txn_id}.json")

    def stage(
        self, table: LakeTable, df: DataFrame, commit_key: str, **merge_kw
    ) -> MergeStats:
        """Stage one participant's merge batch (WAP; invisible until
        :meth:`commit` publishes the whole transaction)."""
        if self._done:
            raise RuntimeError("transaction already finished")
        stage_id = f"txn-{self.txn_id}-{len(self._parts)}"
        stats = merge_into(
            table, df, commit_key, stage_id=stage_id, **merge_kw
        )
        self._parts.append((table, stage_id, commit_key))
        return stats

    def stage_with(self, table: LakeTable, commit_key: str, fn):
        """Stage one participant through an arbitrary write path: ``fn``
        receives the allocated ``stage_id`` and must run a staged commit
        on ``table`` under it (e.g. ``pipeline.apply_batch(...,
        stage_id=stage_id)``) keyed by ``commit_key``. This lets
        full pipelines — winner selection, extraction, DLQ — participate
        in a multi-table transaction, not just raw ``merge_into`` batches.
        The idempotent-replay contract is the callee's: if ``commit_key``
        is already recorded on the table, ``fn`` must no-op WITHOUT
        creating a staged snapshot (``commit_delta`` / ``merge_into``
        already behave this way)."""
        if self._done:
            raise RuntimeError("transaction already finished")
        stage_id = f"txn-{self.txn_id}-{len(self._parts)}"
        result = fn(stage_id)
        self._parts.append((table, stage_id, commit_key))
        return result

    def commit(self) -> None:
        """Publish every participant, all-or-nothing at the manifest
        write (the commit point).

        Idempotent-replay safe at the transaction boundary: a replayed
        ``stage()`` whose commit_key the table ALREADY records no-ops in
        ``merge_into`` without creating a staged snapshot — such a
        participant is published by definition, so it is recorded at the
        version the table's commit log pins and skipped in the publish
        loop, instead of crashing on the absent staged file.

        If a publish raises AFTER the manifest write, the transaction is
        DECIDED (state ``committing`` on disk): run
        :func:`recover_transactions` to finish the remaining publishes —
        ``abort()`` is intentionally impossible past the commit point."""
        if self._done:
            raise RuntimeError("transaction already finished")
        self._done = True
        os.makedirs(self.txn_dir, exist_ok=True)
        participants = []
        for t, sid, ck in self._parts:
            staged = t._staged_path(sid)
            if os.path.exists(staged):
                # The staged snapshot already knows the version it will
                # publish as — recording it here (before any publish)
                # gives read_consistent its cross-table version vector
                # even after a crash-recovery finishes the publishes.
                with open(staged) as f:
                    version = json.load(f)["version"]
            else:
                commits = t.current().commits
                if ck not in commits:
                    raise RuntimeError(
                        f"participant {t.root} has neither a staged "
                        f"snapshot {sid} nor a recorded commit "
                        f"{ck!r} — staged state was lost before commit"
                    )
                version = commits[ck]
            participants.append(
                {"root": t.root, "stage_id": sid, "version": version}
            )
        manifest = {
            "txn_id": self.txn_id,
            "state": _STATE_COMMITTING,
            "participants": participants,
        }
        _atomic_write(self._manifest_path(), json.dumps(manifest))
        try:
            for t, sid, _ck in self._parts:
                if os.path.exists(t._staged_path(sid)):
                    t.publish_staged(sid)
        except Exception as e:
            # Original exception type preserved (callers and crash tests
            # match on it); the note directs recovery.
            e.add_note(
                f"transaction {self.txn_id} is past its commit point "
                f"(manifest state=committing); run recover_transactions "
                f"to finish the remaining publishes — abort is impossible"
            )
            raise
        manifest["state"] = _STATE_COMMITTED
        _atomic_write(self._manifest_path(), json.dumps(manifest))

    def abort(self) -> None:
        """Drop every staged participant; tables are untouched."""
        if self._done:
            raise RuntimeError("transaction already finished")
        self._done = True
        for t, sid, _ck in self._parts:
            if os.path.exists(t._staged_path(sid)):
                t.abort_staged(sid)


def recover_transactions(spark: SparkSession, txn_dir: str) -> dict[str, str]:
    """Finish or clean up transactions found in ``txn_dir`` after a crash
    (run before admitting new writers — single-writer recovery window).
    Returns {txn_id: action} with action ∈ finished|already_committed.

    Manifests in ``committing`` are DECIDED: every participant whose
    staged snapshot still exists is published. Staged commits with no
    manifest (crash pre-commit-point) are NOT touched here — they simply
    stay invisible; the owning table's vacuum reclaims them once aborted
    by an operator or a retrying writer re-stages over them."""
    out: dict[str, str] = {}
    if not os.path.isdir(txn_dir):
        return out
    for fn in sorted(os.listdir(txn_dir)):
        if not (fn.startswith("txn-") and fn.endswith(".json")):
            continue
        path = os.path.join(txn_dir, fn)
        with open(path) as f:
            man = json.load(f)
        if man["state"] == _STATE_COMMITTED:
            out[man["txn_id"]] = "already_committed"
            continue
        for part in man["participants"]:
            t = LakeTable(spark, part["root"])
            if os.path.exists(t._staged_path(part["stage_id"])):
                t.publish_staged(part["stage_id"])
        man["state"] = _STATE_COMMITTED
        _atomic_write(path, json.dumps(man))
        out[man["txn_id"]] = "finished"
    return out


def read_consistent(
    spark: SparkSession, txn_dir: str, txn_id: str
) -> dict[str, DataFrame]:
    """Cross-table snapshot view AS OF one committed transaction: every
    participant pinned to the version that transaction published —
    {table_root: DataFrame}. This closes (for pinned readers) the
    isolation window the live-read path leaves open: a reader racing the
    publish loop can see table A's commit before table B's, but a reader
    going through the transaction's version vector sees all or nothing.

    Requires state ``committed`` (run :func:`recover_transactions` first
    after a crash). The pinned versions are ordinary snapshots —
    ``expire_snapshots`` can age them out; tag them on each table when a
    consistent view must outlive retention."""
    path = os.path.join(txn_dir, f"txn-{txn_id}.json")
    with open(path) as f:
        man = json.load(f)
    if man["state"] != _STATE_COMMITTED:
        raise RuntimeError(
            f"transaction {txn_id} is {man['state']!r}; "
            "run recover_transactions first"
        )
    out: dict[str, DataFrame] = {}
    for part in man["participants"]:
        t = LakeTable(spark, part["root"])
        out[part["root"]] = t.read_version(part["version"])
    return out
