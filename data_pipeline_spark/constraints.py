"""Table-declared CHECK constraints, enforced at the apply boundary.

The Delta Lake / Iceberg ``ALTER TABLE ADD CONSTRAINT check`` surface
re-expressed for a CDC engine: a constraint is a SQL predicate stored in
table properties (``check.<name>``), validated against EXISTING rows when
added, and enforced against every INCOMING event at the apply boundary
(`pipeline.apply_batch`) — with a dead-letter queue armed, violating
events quarantine with reason ``check:<name>`` and the url's previous
valid event keeps winning LWW; without one, the batch refuses loudly
BEFORE any commit (write rejection, the Delta behavior).

Semantics follow SQL CHECK three-valued logic: only a predicate that
evaluates to FALSE violates — NULL passes. That makes constraints safe
for partial-update (patch) feeds, where an event legitimately carries
NULL in every column it does not change. Delete events are exempt: they
carry no payload the table will store.

Scale shape: enforcement is one extra codegen'd scan predicate on the
batch plus an emptiness probe; the constraint-add validation is one
pruned table scan. Nothing here shuffles.

Reference analog: the reference gates uploads with per-item verification
before registering (scripts/run_ingest_register.py:120-143); this is
the declarative, table-owned form.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable, Snapshot

CHECK_PREFIX = "check."
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class CheckViolation(ValueError):
    """Raised when existing rows (add time) or an incoming batch
    (apply time, no DLQ) violate a declared constraint."""


def checks(table: LakeTable, snap: Snapshot | None = None) -> dict[str, str]:
    """Declared constraints: {name: sql_predicate}."""
    props = (snap or table.current()).props
    return {
        k[len(CHECK_PREFIX):]: v
        for k, v in props.items()
        if k.startswith(CHECK_PREFIX)
    }


def _violates(predicate: str) -> F.Column:
    # SQL CHECK semantics: only FALSE violates; NULL passes.
    return F.coalesce(F.expr(predicate).cast("boolean"), F.lit(True)) == False  # noqa: E712


def add_check(table: LakeTable, name: str, predicate: str) -> Snapshot:
    """Declare a constraint. Refuses when the name is taken, the
    predicate does not resolve against the table schema, or any EXISTING
    row violates it (one table scan — the Delta add-constraint contract:
    a declared constraint is a fact about the whole table, not just
    future writes)."""
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid constraint name: {name!r}")
    snap = table.current()
    existing = checks(table, snap)
    if name in existing:
        raise ValueError(
            f"constraint {name!r} already declared: {existing[name]!r}"
        )
    current = table.read()
    try:
        probe = current.filter(_violates(predicate))
    except Exception as e:  # analysis error → clear message
        raise ValueError(
            f"constraint predicate {predicate!r} does not resolve against "
            f"table schema {current.columns}: {e}"
        ) from e
    n_bad = probe.count()
    if n_bad:
        raise CheckViolation(
            f"cannot add constraint {name!r}: {n_bad} existing row(s) "
            f"violate {predicate!r}"
        )
    return table.update_props({CHECK_PREFIX + name: predicate})


def drop_check(table: LakeTable, name: str) -> Snapshot:
    snap = table.current()
    key = CHECK_PREFIX + name
    if key not in snap.props:
        raise ValueError(f"no constraint named {name!r}")
    props = {k: v for k, v in snap.props.items() if k != key}
    new = Snapshot(
        **{
            **snap.__dict__,
            "version": snap.version + 1,
            "manifests": dict(snap.manifests),
            "commits": dict(snap.commits),
            "summary": {"op": "props", "drop_check": name},
            "props": props,
        }
    )
    table._write_snapshot(new, expect_parent=snap.version)
    return new


def violation_reason(
    batch: DataFrame,
    declared: dict[str, str],
    op_col: str | None = "op",
) -> F.Column:
    """First violated constraint per row as ``check:<name>`` (NULL when
    clean). Rows whose ``op_col`` is 'delete' are exempt. A predicate
    referencing a column absent from the batch raises at analysis time —
    a misconfigured constraint must be loud, never silently skipped."""
    reason = F.lit(None).cast("string")
    for name in sorted(declared):
        reason = F.coalesce(
            reason,
            F.when(_violates(declared[name]), F.lit(f"check:{name}")),
        )
    if op_col and op_col in batch.columns:
        reason = F.when(F.col(op_col) == "delete", F.lit(None)).otherwise(
            reason
        )
    return reason


def enforce(
    batch: DataFrame,
    table: LakeTable,
    snap: Snapshot | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Split a batch into (clean, violating-with-__reason). Returns
    ``(batch, None)`` untouched when the table declares no constraints —
    tables without checks pay nothing."""
    declared = checks(table, snap)
    if not declared:
        return batch, None
    reason = violation_reason(batch, declared)
    flagged = batch.withColumn("__reason", reason)
    bad = flagged.filter(F.col("__reason").isNotNull())
    clean = flagged.filter(F.col("__reason").isNull()).drop("__reason")
    return clean, bad
