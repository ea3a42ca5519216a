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


# -- generated columns (Delta GENERATED ALWAYS AS analog) ---------------------

GEN_PREFIX = "generated."


def generated_columns(
    table: LakeTable, snap: Snapshot | None = None
) -> dict[str, str]:
    """Declared generated columns: ``{col: sql_expr}`` from
    ``generated.<col>`` table properties."""
    snap = snap or table.current()
    return {
        k[len(GEN_PREFIX):]: v
        for k, v in snap.props.items()
        if k.startswith(GEN_PREFIX)
    }


def add_generated(table: LakeTable, col: str, expr: str) -> Snapshot:
    """Declare ``col`` as GENERATED ALWAYS AS ``expr`` (Delta generated
    columns): every future write either omits the column (the funnel
    computes it) or must supply values equal to the expression (refused
    otherwise — a generated column is a table-owned derivation, not a
    suggestion). Declaration refuses when the column is the key/order
    (the funnel may not synthesize identity or ordering), the expression
    does not resolve against the OTHER columns, or any EXISTING live row
    disagrees with it (one table scan — same whole-table contract as
    add_check; backfill first via maintenance.update_where)."""
    snap = table.current()
    fields = dict(table.schema_fields(snap))
    if col not in fields:
        raise KeyError(f"no column {col!r}")
    if col in (snap.key, snap.order_col):
        raise ValueError(
            f"{col!r} is the key/order column — not generatable"
        )
    if col in generated_columns(table, snap):
        raise ValueError(f"column {col!r} already generated")
    current = table.read()
    try:
        mismatch = current.filter(
            ~F.col(col).eqNullSafe(F.expr(expr).cast(fields[col]))
        )
    except Exception as e:
        raise ValueError(
            f"generated expression {expr!r} does not resolve against "
            f"table schema {current.columns}: {e}"
        ) from e
    n_bad = mismatch.count()
    if n_bad:
        raise CheckViolation(
            f"cannot declare {col!r} generated: {n_bad} existing row(s) "
            f"disagree with {expr!r} — backfill first"
        )
    return table.update_props({GEN_PREFIX + col: expr})


def drop_generated(table: LakeTable, col: str) -> Snapshot:
    snap = table.current()
    key = GEN_PREFIX + col
    if key not in snap.props:
        raise ValueError(f"column {col!r} is not generated")
    props = {k: v for k, v in snap.props.items() if k != key}
    new = Snapshot(
        **{
            **snap.__dict__,
            "version": snap.version + 1,
            "manifests": dict(snap.manifests),
            "commits": dict(snap.commits),
            "summary": {"op": "props", "drop_generated": col},
            "props": props,
        }
    )
    table._write_snapshot(new, expect_parent=snap.version)
    return new


def apply_generated(
    batch: DataFrame, table: LakeTable, snap: Snapshot
) -> DataFrame:
    """Write-funnel pass for generated columns: omitted columns are
    computed from the expression (delete events keep NULL — tombstones
    carry no payload); supplied columns are VALIDATED against it, and a
    disagreeing non-delete row refuses the whole batch pre-commit (the
    Delta generated-column contract). Tables without declarations pay a
    dict lookup and nothing else."""
    gens = generated_columns(table, snap)
    if not gens:
        return batch
    fields = dict(table.schema_fields(snap))
    is_del = (
        (F.col("op") == "delete")
        if "op" in batch.columns
        else F.lit(False)
    )
    for col in sorted(gens):
        value = F.expr(gens[col]).cast(fields[col])
        if col in batch.columns:
            bad = batch.filter(
                ~is_del & ~F.col(col).eqNullSafe(value)
            )
            if bad.take(1):
                raise CheckViolation(
                    f"batch supplies values for generated column {col!r} "
                    f"that disagree with {gens[col]!r} — omit the column "
                    "or supply the derivation exactly"
                )
        else:
            batch = batch.withColumn(
                col, F.when(is_del, F.lit(None)).otherwise(value)
            )
    return batch
