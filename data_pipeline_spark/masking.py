"""Column masking policies — read-time data governance.

The Databricks/Snowflake masking-policy shape: a policy is a SQL
expression stored in table properties (``mask.<col>``) that REPLACES the
column's value on every non-raw read. Policies may reference other
columns of the same row (``CASE WHEN lang = 'en' THEN text ELSE
'[MASKED]' END``); all policies of a row evaluate against the ORIGINAL
values in one projection, so masking one column never feeds another
column's policy. The masked value casts back to the column's declared
type — a policy cannot drift the schema.

Enforcement lives in ``LakeTable.read`` (one extra projection — pure
codegen, no shuffle): every collapse path (LWW, merge-mode) masks before
returning; ``raw=True`` reads bypass by design (compaction must rewrite
the physical bytes) and ``unmasked=True`` opts out explicitly —
in-process callers are trusted; the policy's job is making the DEFAULT
read safe to hand to downstream consumers. Column-pruned reads
(``columns=``) auto-include a policy's referenced columns below the
collapse and drop them after masking, so pruning never breaks a policy
and never leaks its inputs.

Pairs with ``maintenance.forget`` (erasure) and CHECK constraints
(ingest validation) as the governance surface. The external-reader SQL
export (`lake/interop.py`) documents that it reads PHYSICAL bytes —
masking is an engine read-path policy, so exports are governed by the
caller.

Reference analog: the reference copies assets verbatim and has no
row-policy layer (scripts/convert_v1_s2.py); this is a lake-native
addition.
"""

from __future__ import annotations

import re

from data_pipeline_spark.lake.table import LakeTable, Snapshot

MASK_PREFIX = "mask."
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def masks(table: LakeTable, snap: Snapshot | None = None) -> dict[str, str]:
    """Declared policies: {column: sql_expression}."""
    props = (snap or table.current()).props
    return {
        k[len(MASK_PREFIX):]: v
        for k, v in props.items()
        if k.startswith(MASK_PREFIX)
    }


def add_mask(table: LakeTable, column: str, expr: str) -> Snapshot:
    """Declare a masking policy for ``column``. Refuses when the column
    does not exist, already carries a policy, the expression does not
    resolve against the table schema, or the masked value cannot cast to
    the column's declared type."""
    if not _NAME_RE.match(column):
        raise ValueError(f"invalid column name: {column!r}")
    snap = table.current()
    fields = dict(table.schema_fields(snap))
    if column not in fields:
        raise ValueError(
            f"no column {column!r} in table schema {sorted(fields)}"
        )
    if column in (snap.key, snap.order_col):
        raise ValueError(
            f"cannot mask the {'key' if column == snap.key else 'order'} "
            f"column {column!r}: collapse and bucket routing depend on it"
        )
    existing = masks(table, snap)
    if column in existing:
        raise ValueError(
            f"column {column!r} already carries policy {existing[column]!r}"
        )
    # resolve + type-check against an empty frame with the table schema
    from pyspark.sql import functions as F

    probe = table.spark.createDataFrame(
        [], table.spark_schema(snap)
    )
    try:
        probe.select(F.expr(expr).cast(fields[column]).alias(column))
    except Exception as e:
        raise ValueError(
            f"mask expression {expr!r} does not resolve against table "
            f"schema {sorted(fields)} (or cannot cast to "
            f"{fields[column]}): {e}"
        ) from e
    return table.update_props({MASK_PREFIX + column: expr})


def drop_mask(table: LakeTable, column: str) -> Snapshot:
    snap = table.current()
    key = MASK_PREFIX + column
    if key not in snap.props:
        raise ValueError(f"no masking policy on column {column!r}")
    props = {k: v for k, v in snap.props.items() if k != key}
    new = Snapshot(
        **{
            **snap.__dict__,
            "version": snap.version + 1,
            "manifests": dict(snap.manifests),
            "commits": dict(snap.commits),
            "summary": {"op": "props", "drop_mask": column},
            "props": props,
        }
    )
    table._write_snapshot(new, expect_parent=snap.version)
    return new


def referenced_columns(expr: str, schema_names: set[str]) -> set[str]:
    """Schema columns an expression mentions (identifier-regex ∩ schema —
    conservative superset; quoted literals matching a column name only
    over-include, never under-include)."""
    return set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", expr)) & schema_names


# ============================================================================
# Row access filters — the row-level companion policy
# ============================================================================
#
# ``rowfilter.<name>`` table properties hold SQL predicates; a default
# read returns only rows where EVERY filter is TRUE (Snowflake row
# access policy / Databricks row filter shape). Same trust model as
# masks: ``unmasked=True`` / ``raw=True`` bypass (rewrite paths and
# maintenance predicates must see physical truth — a filtered compaction
# would DELETE the hidden rows), and the default read is what downstream
# consumers get.

ROWFILTER_PREFIX = "rowfilter."


def row_filters(
    table: LakeTable, snap: Snapshot | None = None
) -> dict[str, str]:
    props = (snap or table.current()).props
    return {
        k[len(ROWFILTER_PREFIX):]: v
        for k, v in props.items()
        if k.startswith(ROWFILTER_PREFIX)
    }


def add_row_filter(table: LakeTable, name: str, predicate: str) -> Snapshot:
    """Declare a row filter. Refuses on name reuse or a predicate that
    does not resolve against the table schema."""
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid filter name: {name!r}")
    snap = table.current()
    existing = row_filters(table, snap)
    if name in existing:
        raise ValueError(
            f"row filter {name!r} already declared: {existing[name]!r}"
        )
    from pyspark.sql import functions as F

    probe = table.spark.createDataFrame([], table.spark_schema(snap))
    try:
        probe.filter(F.expr(predicate).cast("boolean"))
    except Exception as e:
        raise ValueError(
            f"row-filter predicate {predicate!r} does not resolve against "
            f"table schema {probe.columns}: {e}"
        ) from e
    return table.update_props({ROWFILTER_PREFIX + name: predicate})


def drop_row_filter(table: LakeTable, name: str) -> Snapshot:
    snap = table.current()
    key = ROWFILTER_PREFIX + name
    if key not in snap.props:
        raise ValueError(f"no row filter named {name!r}")
    props = {k: v for k, v in snap.props.items() if k != key}
    new = Snapshot(
        **{
            **snap.__dict__,
            "version": snap.version + 1,
            "manifests": dict(snap.manifests),
            "commits": dict(snap.commits),
            "summary": {"op": "props", "drop_row_filter": name},
            "props": props,
        }
    )
    table._write_snapshot(new, expect_parent=snap.version)
    return new
